"""Test-only loader for the ACTUAL reference Swin implementation.

Imports `/root/reference/seg18/net/Ours/swin_512.py` directly (executed in
tests only — never imported by the framework package) after stubbing the
three `timm.models.layers` symbols it needs (timm is not installed here).
This gives the test suite a machine-checked anchor: the hand-written replica
in `tests/torch_ref.py` is compared against the reference's own numerics,
not just against what the replica's author believed the reference does.
"""

import importlib.util
import math
import os
import sys
import types

REFERENCE_SWIN = "/root/reference/seg18/net/Ours/swin_512.py"


def _install_timm_stub():
    """Provide timm.models.layers.{DropPath,to_2tuple,trunc_normal_}.

    Minimal reimplementations (public, textbook definitions); only
    `to_2tuple` affects the loaded module's numerics — DropPath is
    constructed solely for drop_path > 0 (all shipped configs use 0) and
    trunc_normal_ only sets an initial value that parity tests overwrite
    via state_dict round-trips.
    """
    if "timm.models.layers" in sys.modules:
        return

    import torch
    import torch.nn as nn

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            # inverse-CDF truncated normal (same scheme as timm/pytorch)
            def cdf(x):
                return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0

            lo, hi = cdf((a - mean) / std), cdf((b - mean) / std)
            tensor.uniform_(2 * lo - 1, 2 * hi - 1)
            tensor.erfinv_()
            tensor.mul_(std * math.sqrt(2.0)).add_(mean)
            tensor.clamp_(min=a, max=b)
        return tensor

    timm_mod = types.ModuleType("timm")
    models_mod = types.ModuleType("timm.models")
    layers_mod = types.ModuleType("timm.models.layers")
    layers_mod.DropPath = DropPath
    layers_mod.to_2tuple = to_2tuple
    layers_mod.trunc_normal_ = trunc_normal_
    timm_mod.models = models_mod
    models_mod.layers = layers_mod
    sys.modules["timm"] = timm_mod
    sys.modules["timm.models"] = models_mod
    sys.modules["timm.models.layers"] = layers_mod


def reference_available():
    return os.path.exists(REFERENCE_SWIN)


def load_reference_swin():
    """Import the reference swin_512 module; returns the loaded module."""
    _install_timm_stub()
    spec = importlib.util.spec_from_file_location("ref_swin_512", REFERENCE_SWIN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
