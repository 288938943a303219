"""Tests for the offline data prep tool and the CLI config plumbing."""

import json
import os

import numpy as np
from PIL import Image

from stswincl_tpu.data.prepare_endovis import main as prepare_main
from stswincl_tpu.cli import main as cli_main


def test_prepare_endovis(tmp_path):
    src = tmp_path / "raw"
    colors = [[i * 20, i * 10, i * 5] for i in range(12)]
    (src / "train").mkdir(parents=True)
    with open(src / "train" / "labels.json", "w") as f:
        json.dump([{"color": c} for c in colors], f)
    rng = np.random.default_rng(0)
    seq = src / "train" / "seq_1"
    (seq / "left_frames").mkdir(parents=True)
    (seq / "labels").mkdir(parents=True)
    for i in range(2):
        img = rng.integers(0, 255, (1024, 1280, 3), dtype=np.uint8)
        Image.fromarray(img).save(seq / "left_frames" / f"frame{i:03d}.png")
        ids = rng.integers(0, 12, (1024, 1280), dtype=np.uint8)
        rgb = np.array(colors, dtype=np.uint8)[ids]
        Image.fromarray(rgb).save(seq / "labels" / f"frame{i:03d}.png")

    dst = tmp_path / "processed"
    prepare_main(["--src", str(src), "--dst", str(dst), "--split", "train"])

    img = Image.open(dst / "Processed_train" / "seq_1" / "left_frames"
                     / "frame000.png")
    assert img.size == (640, 512)
    gray = np.asarray(Image.open(
        dst / "Processed_train" / "seq_1" / "labels" / "grayframe000.png"))
    assert gray.shape == (512, 640)
    assert gray.max() < 12


def test_cli_config_print(capsys, tmp_path, monkeypatch):
    """CLI builds and prints the config; pipelines run on synthetic data."""
    import stswincl_tpu.pipelines.seg as seg_mod

    captured = {}

    def fake_run(cfg):
        captured["cfg"] = cfg
        return 0.0

    monkeypatch.setattr(seg_mod, "run_seg_training", fake_run)
    cli_main(["train-seg", "data.dataset=synthetic", "lr=0.01",
              f"ckpt_dir={tmp_path}/c", f"log_dir={tmp_path}/l"])
    assert captured["cfg"].lr == 0.01
    assert captured["cfg"].data.dataset == "synthetic"
    out = capsys.readouterr().out
    assert '"lr": 0.01' in out


def test_cli_finetune_defaults(monkeypatch, tmp_path):
    import stswincl_tpu.pipelines.seg as seg_mod

    captured = {}
    monkeypatch.setattr(seg_mod, "run_seg_training",
                        lambda cfg: captured.update(cfg=cfg) or 0.0)
    cli_main(["finetune-cl", "data.dataset=synthetic",
              f"ckpt_dir={tmp_path}/c", f"log_dir={tmp_path}/l"])
    cfg = captured["cfg"]
    assert cfg.optimizer == "sgd" and cfg.lr == 1e-3
    assert cfg.lr_scheduler == "poly" and cfg.num_epochs == 200
