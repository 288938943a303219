"""Cross-stage checkpoint translation on REAL model variable trees.

The toy-dict tests in test_checkpoint.py validate the merge mechanics;
this validates that the actual TswinPlus and ContrastEncoder trees line up
subtree-for-subtree (the reference's load_model_full / load_model_mswin_CL
hand-off chain, stage 1 -> 2 -> 3)."""

import numpy as np
import jax
import jax.numpy as jnp
import flax

from stswincl_tpu.models import TswinPlus, ContrastEncoder
from stswincl_tpu.ckpt import (
    translate_seg_to_pretrain,
    translate_pretrain_to_seg,
)
from stswincl_tpu.ckpt.checkpoint import SEG_ENCODER_SUBTREES


def test_stage1_to_stage2_to_stage3_handoff(rng):
    seg = TswinPlus(num_classes=5, swin_dim=64)
    enc = ContrastEncoder(num_classes=5, swin_dim=64)
    clip = jnp.asarray(rng.standard_normal((1, 4, 64, 128, 3)).astype(np.float32))

    seg_vars = seg.init(jax.random.key(1), clip, train=False)
    enc_vars = enc.init(jax.random.key(2), clip, train=False)
    seg_p = flax.core.unfreeze(seg_vars["params"])
    enc_p = flax.core.unfreeze(enc_vars["params"])

    # stage 1 -> 2: every encoder subtree must transfer with zero skips
    merged, skipped = translate_seg_to_pretrain(seg_p, enc_p)
    assert skipped == [], f"skipped: {skipped[:5]}"
    for sub in SEG_ENCODER_SUBTREES:
        a = jax.tree.leaves(merged["segmentor"][sub])
        b = jax.tree.leaves(seg_p[sub])
        assert all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(a, b)), sub
    # projector untouched by the translation
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(merged["projector"])[0]),
        np.asarray(jax.tree.leaves(enc_p["projector"])[0]))

    # stage 2 -> 3: back into a fresh seg tree; classifier keeps fresh init
    seg2_vars = seg.init(jax.random.key(3), clip, train=False)
    seg2_p = flax.core.unfreeze(seg2_vars["params"])
    back, skipped2 = translate_pretrain_to_seg(merged, seg2_p)
    assert skipped2 == [], f"skipped: {skipped2[:5]}"
    for sub in SEG_ENCODER_SUBTREES:
        a = jax.tree.leaves(back[sub])
        b = jax.tree.leaves(seg_p[sub])
        assert all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(a, b)), sub
    # classifier stayed at seg2's fresh init
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(back["classifier"])[0]),
        np.asarray(jax.tree.leaves(seg2_p["classifier"])[0]))

    # the translated tree must run the model
    stats = seg_vars["batch_stats"]
    y = seg.apply({"params": back, "batch_stats": stats}, clip, train=False)
    assert y.shape == (1, 64, 128, 5)

    # batch_stats translate the same way
    seg_s = flax.core.unfreeze(seg_vars["batch_stats"])
    enc_s = flax.core.unfreeze(enc_vars["batch_stats"])
    merged_s, sk = translate_seg_to_pretrain(seg_s, enc_s)
    assert sk == []
