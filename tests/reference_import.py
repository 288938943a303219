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


def _install_torchvision_stub():
    """Provide `torchvision.models.resnet18` for the reference
    `seg18/net/Ours/resnet.py:98` import (torchvision is not installed).

    The stub rebuilds torchvision's resnet18 architecture (a fixed public
    spec) in plain torch with IDENTICAL children() ordering — the reference
    keeps `children()[:-4]` (conv1, bn1, relu, maxpool, layer1, layer2) —
    and torchvision's submodule naming, so state_dicts interchange with
    both the reference packaging and `tests/torch_ref.TResNetOS8`. The
    reference's own code (dilated layer4/layer5, `make_layer`, the model
    wiring) is exercised unmodified.
    """
    if "torchvision" in sys.modules:
        return

    import torch.nn as nn

    class _BasicBlock(nn.Module):
        def __init__(self, in_ch, ch, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(in_ch, ch, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(ch)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(ch)
            if stride != 1 or in_ch != ch:
                self.downsample = nn.Sequential(
                    nn.Conv2d(in_ch, ch, 1, stride, bias=False),
                    nn.BatchNorm2d(ch))
            else:
                self.downsample = None

        def forward(self, x):
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            identity = x if self.downsample is None else self.downsample(x)
            return self.relu(out + identity)

    class _ResNet18(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(_BasicBlock(64, 64),
                                        _BasicBlock(64, 64))
            self.layer2 = nn.Sequential(_BasicBlock(64, 128, 2),
                                        _BasicBlock(128, 128))
            self.layer3 = nn.Sequential(_BasicBlock(128, 256, 2),
                                        _BasicBlock(256, 256))
            self.layer4 = nn.Sequential(_BasicBlock(256, 512, 2),
                                        _BasicBlock(512, 512))
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(512, 1000)

    tv_mod = types.ModuleType("torchvision")
    models_mod = types.ModuleType("torchvision.models")
    models_mod.resnet18 = _ResNet18
    models_mod.resnet34 = _ResNet18  # reference only constructs 18
    tv_mod.models = models_mod
    sys.modules["torchvision"] = tv_mod
    sys.modules["torchvision.models"] = models_mod


class patched_torch_load:
    """Context manager: `torch.load(path)` returns the model's own
    state_dict for the reference's hard-coded pretrained-weights path
    (`resnet.py:100`, a file that does not exist here) — the load becomes
    an identity so the constructor succeeds."""

    def __enter__(self):
        import torch
        import torchvision.models as models
        self._orig = torch.load
        self._torch = torch
        torch.load = lambda *a, **k: models.resnet18().state_dict()
        return self

    def __exit__(self, *exc):
        self._torch.load = self._orig
        return False


def load_reference_seg18():
    """Import the reference `net.Ours.base18` (TswinPlus + DeepLabV3Plus)
    and `net.Ours.resnet` as a real package from /root/reference/seg18,
    with the timm + torchvision shims installed. Returns (base18, resnet)
    modules. Construct models under `patched_torch_load()`."""
    _install_timm_stub()
    _install_torchvision_stub()
    root = os.path.dirname(os.path.dirname(REFERENCE_SWIN))  # seg18/net
    seg18 = os.path.dirname(root)
    if seg18 not in sys.path:
        sys.path.insert(0, seg18)
    import importlib
    resnet = importlib.import_module("net.Ours.resnet")
    base18 = importlib.import_module("net.Ours.base18")
    return base18, resnet


def randomize_state_dict(sd, seed):
    """Refill every float tensor of a state_dict from a numpy PCG64 stream
    (deterministic across torch versions, unlike torch RNG use), in sorted
    key order. BatchNorm running_var gets uniform(0.5, 1.5) so eval-mode
    normalization stays finite; derived attention masks are kept."""
    import numpy as np
    import torch

    rng = np.random.Generator(np.random.PCG64(seed))
    out = {}
    for k in sorted(sd.keys()):
        v = sd[k]
        shape = tuple(v.shape)
        if not v.dtype.is_floating_point or k.endswith("attn_mask"):
            out[k] = v
        elif k.endswith("running_var"):
            out[k] = torch.from_numpy(
                rng.uniform(0.5, 1.5, shape).astype(np.float32))
        elif len(shape) >= 2:
            # fan-in-scaled so activations stay O(1) through the deep net
            # (flat U(-0.5, 0.5) overflows fp32 within a few 512-wide convs)
            bound = float(np.sqrt(1.0 / max(1, int(np.prod(shape[1:])))))
            out[k] = torch.from_numpy(
                rng.uniform(-bound, bound, shape).astype(np.float32))
        else:
            out[k] = torch.from_numpy(
                rng.uniform(-0.5, 0.5, shape).astype(np.float32))
    return out


def reference_available():
    return os.path.exists(REFERENCE_SWIN)


def load_reference_swin():
    """Import the reference swin_512 module; returns the loaded module."""
    _install_timm_stub()
    spec = importlib.util.spec_from_file_location("ref_swin_512", REFERENCE_SWIN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
