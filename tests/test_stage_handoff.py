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


def test_cross_arch_deeplab_to_swin_warm_start(tmp_path, rng):
    """The canonical pre-stage flow (`seg18/exp.sh:3-8`): a DeepLabV3Plus
    checkpoint warm-starts a TswinPlus run via `init_checkpoint`. The merge
    must be reference-tolerant (`seg18/utils/LoadModel.py:51-90`): the
    resnet subtree transfers, shape-mismatched/missing leaves keep the
    fresh init, and the resulting tree runs the model."""
    import logging

    from stswincl_tpu.models import DeepLabV3Plus
    from stswincl_tpu.ckpt import save_checkpoint
    from stswincl_tpu.configs import SegTrainConfig
    from stswincl_tpu.pipelines.seg import _warm_start

    dl = DeepLabV3Plus(num_classes=5, width=8)
    img = jnp.asarray(rng.standard_normal((1, 64, 128, 3)).astype(np.float32))
    dl_vars = dl.init(jax.random.key(7), img, train=False)
    # shift params so "transferred" is distinguishable from "fresh init"
    # (small shift: large ones explode activations through the resnet)
    dl_p = jax.tree.map(lambda a: np.asarray(a) + 1e-3,
                        flax.core.unfreeze(dl_vars["params"]))
    dl_s = flax.core.unfreeze(dl_vars["batch_stats"])
    save_checkpoint(str(tmp_path / "dl"), 0,
                    {"params": dl_p, "batch_stats": dl_s})

    seg = TswinPlus(num_classes=5, swin_dim=64)
    clip = jnp.asarray(rng.standard_normal((1, 4, 64, 128, 3)).astype(np.float32))
    seg_vars = seg.init(jax.random.key(8), clip, train=False)
    fresh_p = flax.core.unfreeze(seg_vars["params"])

    cfg = SegTrainConfig(init_checkpoint=str(tmp_path / "dl"))
    merged = _warm_start(cfg, seg_vars, logging.getLogger("test"))

    # resnet subtree transferred wholesale (same arch + width)
    for a, b in zip(jax.tree.leaves(merged["params"]["resnet"]),
                    jax.tree.leaves(dl_p["resnet"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # swin has no counterpart in the deeplab ckpt -> kept fresh init
    for a, b in zip(jax.tree.leaves(merged["params"]["swin"]),
                    jax.tree.leaves(fresh_p["swin"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # aspp input width differs (64 vs 128 ch) -> mismatched leaves kept init
    a0 = merged["params"]["aspp"]["branch_1x1"]["conv"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(a0),
        np.asarray(fresh_p["aspp"]["branch_1x1"]["conv"]["kernel"]))
    # classifier conv2 (256 -> C, shared shape) transfers; conv1 (input
    # width differs) keeps init — the reference's leaf-level behavior
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["classifier"]["conv2"]["kernel"]),
        np.asarray(dl_p["classifier"]["conv2"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["classifier"]["conv1"]["kernel"]),
        np.asarray(fresh_p["classifier"]["conv1"]["kernel"]))

    # and the merged tree must actually run
    y = seg.apply(merged, clip, train=False)
    assert y.shape == (1, 64, 128, 5)
    assert np.isfinite(np.asarray(y)).all()
