"""Orbax checkpointing + cross-stage checkpoint translation.

Replaces the reference's two ad-hoc formats (bare `.t7` state_dicts from the
seg loops, `seg18/utils/summary.py:83-88`, and full-state `.pth` dicts from
pretraining, `main_pretrain_swinv5.py:87-103`) with a single Orbax tree per
step: ``{params, batch_stats, opt_state..., step}``. Stage hand-offs that
the reference performs with a zoo of string-surgery loaders
(`seg18/utils/LoadModel.py`, `segcata/utils/LoadModel.py`) become named
subtree selection here:

  * seg stage-1 ckpt -> contrastive encoder init: the whole seg param tree
    minus the classifier becomes the encoder's `segmentor` subtree, the
    projector keeps its fresh init (`load_model_full` semantics,
    `PixPro_swin_v5.py:162-183`);
  * pretrain ckpt -> stage-3 fine-tune init: the `segmentor` subtree maps
    back into the seg tree, classifier keeps fresh init
    (`load_model_mswin_CL` semantics, `seg18/utils/LoadModel.py:6-49`).

Like the reference loaders, translation is tolerant: leaves that are absent
or shape-mismatched on the destination fall back to the destination's own
init, and the skipped paths are returned for logging.
"""

from __future__ import annotations

import os
import re
from typing import Any, List, Optional, Tuple

import jax
import numpy as np

try:  # orbax is the primary backend; fall back to msgpack if unavailable
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

from flax import serialization

_STEP_RE = re.compile(r"^step_(\d+)$")


def _step_dir(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"step_{step}")


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> str:
    """Save a pytree `state` under `ckpt_dir/step_<step>`."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = _step_dir(ckpt_dir, step)
    state = jax.device_get(state)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        ckptr.wait_until_finished()
    else:  # pragma: no cover
        with open(path + ".msgpack", "wb") as f:
            f.write(serialization.to_bytes(state))
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name.removesuffix(".msgpack"))
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def load_checkpoint(ckpt_dir: str, step: Optional[int] = None,
                    target: Any = None) -> Any:
    """Load `ckpt_dir/step_<step>` (default: latest). `target` gives the
    tree structure/dtypes for restoration."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = _step_dir(ckpt_dir, step)
    if _HAS_ORBAX and os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        if target is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
            return ckptr.restore(os.path.abspath(path), abstract)
        return ckptr.restore(os.path.abspath(path))
    with open(path + ".msgpack", "rb") as f:  # pragma: no cover
        return serialization.from_bytes(target, f.read())


# ---------------- stage translation ----------------

SEG_ENCODER_SUBTREES = (
    "resnet", "swin", "aspp", "project1", "project2", "project3",
)


def _merge(dst: dict, src: dict, path: Tuple[str, ...],
           skipped: List[str]) -> dict:
    """Copy leaves of `src` over `dst` where present + shape-compatible."""
    out = dict(dst)
    for k, v in src.items():
        if k not in out:
            skipped.append("/".join(path + (k,)) + " (missing in target)")
            continue
        if isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = _merge(out[k], v, path + (k,), skipped)
        else:
            if tuple(np.shape(out[k])) != tuple(np.shape(v)):
                skipped.append("/".join(path + (k,)) + " (shape mismatch)")
                continue
            out[k] = v
    return out


def translate_seg_to_pretrain(
    seg_tree: dict, enc_init_tree: dict
) -> Tuple[dict, List[str]]:
    """Seg model variables -> ContrastEncoder variables (one collection at a
    time, e.g. params or batch_stats). Encoder subtrees are initialized from
    the seg checkpoint; the projector (and anything else) keeps `enc_init`.
    """
    skipped: List[str] = []
    out = dict(enc_init_tree)
    seg_sub = {k: v for k, v in seg_tree.items() if k in SEG_ENCODER_SUBTREES}
    if "segmentor" in out:
        out["segmentor"] = _merge(out["segmentor"], seg_sub, ("segmentor",), skipped)
    return out, skipped


def translate_pretrain_to_seg(
    enc_tree: dict, seg_init_tree: dict
) -> Tuple[dict, List[str]]:
    """ContrastEncoder variables -> seg model variables. The classifier (and
    anything absent from the encoder) keeps the fresh `seg_init` values."""
    skipped: List[str] = []
    src = enc_tree.get("segmentor", {})
    out = _merge(seg_init_tree, {k: v for k, v in src.items()
                                 if k in SEG_ENCODER_SUBTREES}, (), skipped)
    return out, skipped
