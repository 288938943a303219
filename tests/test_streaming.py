"""Streaming segmenter == full-clip forward for identical frames."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stswincl_tpu.models import TswinPlus
from stswincl_tpu.pipelines.streaming import StreamingSegmenter


def test_streaming_matches_full_clip(rng):
    model = TswinPlus(num_classes=5, swin_dim=64)
    H, W = 64, 128
    frames = rng.standard_normal((7, H, W, 3)).astype(np.float32)
    clip0 = jnp.asarray(frames[None, 0:4])  # (1, 4, H, W, 3)
    variables = model.init(jax.random.key(0), clip0, train=False)

    seg = StreamingSegmenter(model, variables, out_hw=None)
    cache = seg.init_cache(clip0)

    for i in range(4, 7):
        cache, pred = seg.predict_next(
            cache, jnp.asarray(frames[None, i]))
        clip = jnp.asarray(frames[None, i - 3:i + 1])
        full_logits = model.apply(variables, clip, train=False)
        full_pred = jnp.argmax(full_logits, axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(pred), np.asarray(full_pred))


@pytest.mark.parametrize("align_out,out_hw", [
    (True, (96, 160)),    # EndoVis protocol: align_corners resize
    (False, (68, 120)),   # CaDIS protocol: half-pixel resize to 540x960
                          # (`segcata/cata_test.py:126-136`) — non-integer
                          # scale, align_corners=False
])
def test_streaming_matches_eval_step_protocols(rng, align_out, out_hw):
    """Streaming must be bit-identical to the full-clip EVAL STEP under
    BOTH scoring protocols (r4 covered only the EndoVis align-corners
    path; `evaluate_split` wires `align_out=False` for CaDIS)."""
    from stswincl_tpu.train import make_seg_eval_step

    model = TswinPlus(num_classes=5, swin_dim=64)
    H, W = 64, 128
    frames = rng.standard_normal((6, H, W, 3)).astype(np.float32)
    clip0 = jnp.asarray(frames[None, 0:4])
    variables = model.init(jax.random.key(0), clip0, train=False)

    seg = StreamingSegmenter(model, variables, out_hw=out_hw,
                             align_out=align_out)
    cache = seg.init_cache(clip0)
    eval_step = make_seg_eval_step(model, out_hw=out_hw,
                                   align_corners=align_out)
    params, stats = variables["params"], variables.get("batch_stats", {})

    for i in range(4, 6):
        cache, pred = seg.predict_next(cache, jnp.asarray(frames[None, i]))
        assert pred.shape[-2:] == out_hw
        full_pred = eval_step(params, stats,
                              jnp.asarray(frames[None, i - 3:i + 1]))
        np.testing.assert_array_equal(np.asarray(pred),
                                      np.asarray(full_pred))


def test_streaming_nondefault_depths(rng):
    """StreamingSegmenter must plumb model.swin_depths into its head: a
    depths=(2, 2) model's variable tree (4 swin layers) has to apply
    cleanly and reproduce the full-clip argmax bit-exactly."""
    model = TswinPlus(num_classes=5, swin_dim=64, swin_depths=(2, 2))
    H, W = 64, 128
    frames = rng.standard_normal((5, H, W, 3)).astype(np.float32)
    clip0 = jnp.asarray(frames[None, 0:4])
    variables = model.init(jax.random.key(0), clip0, train=False)

    seg = StreamingSegmenter(model, variables, out_hw=None)
    cache = seg.init_cache(clip0)
    cache, pred = seg.predict_next(cache, jnp.asarray(frames[None, 4]))
    full_logits = model.apply(variables, jnp.asarray(frames[None, 1:5]),
                              train=False)
    full_pred = jnp.argmax(full_logits, axis=-1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(full_pred))
