"""Supervised segmentation training (stages 1 and 3).

Capability parity with `seg18/train_swin.py` / `train_CL_ft_mswin_sgd_minput.py`
(and the segcata twins): OHEM cross-entropy (or Dice/BCE), bf16 compute with
fp32 params (the TPU replacement for torch.cuda.amp — no loss scaler needed
for bf16), per-iteration LR schedules, BN running-stat updates, full-res
align-corners evaluation.

The train step is ONE jitted function; under a data mesh the batch arrives
sharded and XLA inserts the gradient psum + global BN statistics
automatically (see `stswincl_tpu/parallel/mesh.py`).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from stswincl_tpu.ops.ohem import (
    ohem_cross_entropy,
    ohem_cross_entropy_channels_first,
    per_pixel_ce_channels_first,
)


class SegTrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        return cls(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )


def dice_loss(logits: jnp.ndarray, labels: jnp.ndarray, num_classes: int):
    """Reference DiceLoss (`seg18/utils/losses.py:9-14`): global soft dice
    over one-hot targets."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    inter = jnp.sum(probs * onehot)
    union = jnp.sum(probs) + jnp.sum(onehot) + 1e-6
    return 1.0 - 2.0 * inter / union


def bce_loss(logits: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
             ignore_index: int = -1):
    """Reference BCELoss (`seg18/utils/losses.py:92-124`): softmax over
    classes, then per-class binary cross-entropy against the one-hot target,
    averaged over classes (the ignored class contributes nothing)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    per_class_bce = -(onehot * jnp.log(probs)
                      + (1.0 - onehot) * jnp.log(1.0 - probs))
    per_class = jnp.mean(per_class_bce.reshape(-1, num_classes), axis=0)
    if 0 <= ignore_index < num_classes:
        mask = jnp.ones(num_classes).at[ignore_index].set(0.0)
        per_class = per_class * mask
    return jnp.sum(per_class) / num_classes


def make_seg_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_type: str = "ohem",
    ohem_n_min: Optional[int] = None,
    ohem_thresh: float = 0.7,
    ignore_index: int = -1,
) -> Callable:
    """Build the jitted train step: (state, images, labels) -> (state, metrics).

    images: (B, T, H, W, 3); labels: (B, H, W) int32. `ohem_n_min` defaults
    to the reference's H*W/16 (`train_swin.py:123` — note: per-IMAGE pixel
    count, even though the loss sorts over the flattened batch).
    """

    # the OHEM/CE paths consume channels-first logits so the (small) class
    # axis never lands in the TPU lane dimension (HBM-padding blowup
    # otherwise — see ohem_cross_entropy_channels_first)
    cf = loss_type in ("ohem", "ce") and hasattr(model, "trunk")

    def loss_fn(params, batch_stats, images, labels):
        kwargs = {"channels_first_logits": True} if cf else {}
        logits, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"], **kwargs,
        )
        n_min = ohem_n_min
        if n_min is None:
            _, h, w = labels.shape
            n_min = h * w // 16  # reference: per-image count (train_swin.py:123)
        if loss_type == "ohem":
            if cf:
                loss = ohem_cross_entropy_channels_first(
                    logits, labels, n_min, ohem_thresh, ignore_index)
            else:
                loss = ohem_cross_entropy(logits, labels, n_min, ohem_thresh,
                                          ignore_index)
        elif loss_type == "dice":
            loss = dice_loss(logits, labels, logits.shape[-1])
        elif loss_type == "bce":
            loss = bce_loss(logits, labels, logits.shape[-1], ignore_index)
        else:  # plain CE
            valid = labels != ignore_index
            if cf:
                ce = per_pixel_ce_channels_first(logits, labels, ignore_index)
            else:
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32),
                    jnp.where(valid, labels, 0)) * valid
            loss = jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1)
        return loss, updates["batch_stats"]

    @jax.jit
    def train_step(state: SegTrainState, images, labels):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   images, labels)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, batch_stats=new_stats,
            opt_state=new_opt, step=state.step + 1)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return train_step


def make_seg_eval_step(model, out_hw: Optional[Tuple[int, int]] = None,
                       align_corners: bool = True,
                       head_res_logits: bool = True,
                       exact: Optional[bool] = None) -> Callable:
    """Jitted eval: clip -> predicted class map.

    Replicates the reference test loops INSIDE one XLA program: forward,
    bilinear upsample to scoring resolution, softmax, argmax — no host
    round-trips until the final int map (the reference pays a GPU->CPU copy
    + python loop per frame). EndoVis scores with align_corners=True
    (`seg18/test.py:155`); CaDIS with align_corners=False
    (`segcata/cata_test.py:129`) — pass the matching flag.

    With ``head_res_logits`` (models that accept the kwarg — `TswinPlus`),
    the model returns raw channels-first head-resolution logits and its
    bilinear upsample to input resolution is COMPOSED with the eval-protocol
    resize into one matrix pair (`composed_upsample_argmax_cf`): softmax
    then argmax == argmax of logits, and neither full-resolution logit
    tensor is ever materialized (each cost ~13 ms/batch through XLA at the
    EndoVis eval shape). Pass False for models without the kwarg — they
    return finished NHWC logits at their own output resolution.

    ``exact`` opts the fused resize+argmax kernel out of its bf16
    matmul-input demotion. Default (None): follow the model's compute
    dtype — an fp32 model gets the fp32 resize so a full-fp32 parity run
    really is fp32 end-to-end (near-tie pixels can otherwise flip class);
    a bf16 serving model keeps the fast path.
    """
    from stswincl_tpu.ops.resize import (
        composed_upsample_argmax_cf, upsample_argmax)

    if exact is None:
        exact = getattr(model, "dtype", jnp.float32) == jnp.float32

    @jax.jit
    def eval_step(params, batch_stats, images):
        variables = {"params": params, "batch_stats": batch_stats}
        mid = images.shape[-3], images.shape[-2]
        if head_res_logits:
            lcf = model.apply(variables, images, train=False,
                              head_res_logits=True)
            hw = out_hw if out_hw is not None else mid
            return composed_upsample_argmax_cf(lcf, mid, hw,
                                               align_out=align_corners,
                                               exact=exact)
        logits = model.apply(variables, images, train=False)
        hw = out_hw if out_hw is not None else logits.shape[-3:-1]
        return upsample_argmax(logits, *hw, align_corners=align_corners,
                               exact=exact)

    return eval_step
