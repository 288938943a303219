"""End-to-end pipeline smoke tests on synthetic data (8-dev CPU mesh)."""

import os

import numpy as np
import pytest

from stswincl_tpu.configs import (
    SegTrainConfig, ContrastTrainConfig, DataConfig, ModelConfig,
    apply_overrides, to_json, load_config,
)


def test_config_roundtrip(tmp_path):
    cfg = SegTrainConfig()
    cfg = apply_overrides(cfg, ["lr=0.01", "data.batch_size=16",
                                "data.crop_hw=(64,128)", "loss=dice"])
    assert cfg.lr == 0.01
    assert cfg.data.batch_size == 16
    assert cfg.data.crop_hw == (64, 128)
    p = tmp_path / "cfg.json"
    p.write_text(to_json(cfg))
    back = load_config(SegTrainConfig, str(p))
    assert back.lr == 0.01 and back.data.crop_hw == (64, 128)


@pytest.mark.slow
def test_seg_training_e2e(tmp_path):
    """Two epochs of stage-1 training on synthetic data must run the full
    loop (train + eval + checkpoint + early-stop bookkeeping) and produce a
    finite decreasing loss."""
    cfg = SegTrainConfig(
        data=DataConfig(dataset="synthetic", t=4, crop_hw=(64, 128),
                        num_classes=5, batch_size=8, num_workers=2),
        model=ModelConfig(num_classes=5, swin_dim=64, dtype="float32"),
        lr=1e-3,
        num_epochs=2,
        eval_every=1,
        eval_hw=(64, 128),
        ckpt_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
    )
    from stswincl_tpu.pipelines.seg import run_seg_training

    best = run_seg_training(cfg)
    assert np.isfinite(best)
    from stswincl_tpu.ckpt import latest_step
    assert latest_step(cfg.ckpt_dir) is not None
    assert os.path.exists(os.path.join(cfg.log_dir, "metrics.jsonl"))


@pytest.mark.slow
def test_contrast_training_e2e(tmp_path):
    cfg = ContrastTrainConfig(
        data=DataConfig(dataset="synthetic", t=4, crop_hw=(64, 128),
                        num_classes=5, batch_size=8, num_workers=2),
        model=ModelConfig(num_classes=5, swin_dim=64, dtype="float32"),
        num_epochs=1,
        warmup_epochs=0,
        save_every_epochs=1,
        ckpt_dir=str(tmp_path / "cl_ckpt"),
        log_dir=str(tmp_path / "cl_logs"),
    )
    from stswincl_tpu.pipelines.contrast import run_contrast_pretraining

    state = run_contrast_pretraining(cfg)
    assert int(state.step) > 0
    from stswincl_tpu.ckpt import latest_step
    assert latest_step(cfg.ckpt_dir) is not None


@pytest.mark.slow
def test_cli_test_command_e2e(tmp_path):
    """Train briefly, then exercise the `test` CLI path end-to-end."""
    cfg = SegTrainConfig(
        data=DataConfig(dataset="synthetic", t=4, crop_hw=(64, 128),
                        num_classes=5, batch_size=8, num_workers=2),
        model=ModelConfig(num_classes=5, swin_dim=64, dtype="float32"),
        lr=1e-3,
        num_epochs=1,
        eval_every=1,
        eval_hw=(64, 128),
        ckpt_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
    )
    from stswincl_tpu.pipelines.seg import run_seg_training
    from stswincl_tpu.pipelines.evaluate import run_test

    run_seg_training(cfg)
    cfg.test_checkpoint = cfg.ckpt_dir
    cfg.viz_dir = str(tmp_path / "viz")
    summary = run_test(cfg)
    assert summary["frames"] > 0
    assert 0.0 <= summary["iou"] <= 1.0

    # qualitative viz dump (`seg18/test.py:162-169` capability): one RGB
    # PNG per evaluated frame, at the label resolution
    import glob
    from PIL import Image
    pngs = sorted(glob.glob(os.path.join(cfg.viz_dir, "*.png")))
    assert len(pngs) == summary["frames"]
    im = Image.open(pngs[0])
    assert im.mode == "RGB" and im.size == (128, 64)

    # streaming serving mode (`test streaming_eval=true`): predictions are
    # bit-equal to the full-clip path, so every metric must be identical;
    # after the first clip every sliding-window frame rides the cache
    cfg.viz_dir = None
    cfg.streaming_eval = True
    s2 = run_test(cfg)
    assert s2["streamed_frames"] == s2["frames"] - 1
    for k, v in summary.items():
        if k in ("sec_per_frame",):
            continue
        assert s2[k] == v or np.allclose(s2[k], v), (k, v, s2[k])


def test_streaming_eval_discontinuity(rng_seed=0):
    """evaluate_split(streaming=True) across a SEQUENCE BOUNDARY: the
    non-sliding frame must fall back to a full-clip forward (re-seeding the
    cache via init_and_predict) and metrics must still match the full-clip
    run exactly."""
    import jax
    from stswincl_tpu.data.loader import SyntheticSegDataset
    from stswincl_tpu.models import TswinPlus
    from stswincl_tpu.pipelines.evaluate import evaluate_split

    class TwoSeq(SyntheticSegDataset):
        """Synthetic stream split into two sequences at index 4: sample 4
        restarts frame numbering, so its clip is NOT the previous clip
        advanced by one slot."""

        def get(self, index, rng=None):
            s = super().get(index, rng)
            f = s["path"][1]
            s["path"] = (1, f) if index < 4 else (2, f - 4)
            return s

    ds = TwoSeq(length=8, t=4, hw=(64, 128), num_classes=5)
    model = TswinPlus(num_classes=5, swin_dim=64)
    clip0 = ds.get(0)["image"][None]
    variables = model.init(jax.random.key(0), clip0, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    cfg = SegTrainConfig(
        data=DataConfig(dataset="synthetic", num_classes=5,
                        crop_hw=(64, 128)),
        eval_hw=(64, 128))

    full = evaluate_split(model, params, stats, ds, cfg, streaming=False)
    sm = evaluate_split(model, params, stats, ds, cfg, streaming=True)
    # boundaries: sample 0 (first) and sample 4 (sequence restart) fall back
    assert sm["streamed_frames"] == 6
    for k, v in full.items():
        if k == "sec_per_frame":
            continue
        assert sm[k] == v or np.allclose(sm[k], v), (k, v, sm[k])
