"""CLI-level three-stage pipeline smoke: the exact flow of
`examples/endovis18_full_pipeline.sh` (ref: `seg18/exp.sh:3-17`) driven
through `python -m stswincl_tpu.cli` argument parsing, on synthetic data —
deeplab pre-stage -> stage 1 -> stage 2 -> stage 3 -> test with viz — so the
checkpoint-translation chain (`load_model` / `load_model_mswin_CL`
equivalents) is exercised end-to-end at the CLI boundary, not only at the
library level (tests/test_stage_handoff.py).
"""

import glob
import json
import os

import pytest

from stswincl_tpu.cli import main as cli_main


@pytest.mark.slow
def test_cli_three_stage_pipeline(tmp_path, capsys):
    out = str(tmp_path)
    tiny = [
        "data.dataset=synthetic", "data.crop_hw=(64,128)",
        "data.num_classes=5", "data.batch_size=8", "data.num_workers=1",
        "model.num_classes=5", "model.swin_dim=64", "model.swin_depths=(2,2)",
        "model.dtype=float32",
        "num_epochs=1", "eval_hw=(64,128)",
    ]

    # (pre-stage) DeepLab ResNet-init pretraining, exp.sh:3-8
    cli_main(["train-seg", *tiny, "model.arch=puredeeplab18", "data.t=1",
              "lr=3e-4", "optimizer=adam", "loss=ohem",
              f"ckpt_dir={out}/deeplab", f"log_dir={out}/deeplab/logs"])
    assert os.path.isdir(f"{out}/deeplab/best")

    # stage 1 — intra-video supervised training, exp.sh:3-4
    cli_main(["train-seg", *tiny, "data.t=4",
              "lr=3e-4", "optimizer=adam", "loss=ohem",
              f"init_checkpoint={out}/deeplab/best",
              f"ckpt_dir={out}/stage1", f"log_dir={out}/stage1/logs"])
    assert os.path.isdir(f"{out}/stage1/best")

    # stage 2 — inter-video contrastive pretraining, pixpro_swin_ver.sh:9-40
    cli_main(["pretrain-contrast", *[o for o in tiny
                                     if not o.startswith("eval_hw")],
              "data.t=4", "base_lr=1.0", "weight_decay=1e-5",
              "warmup_epochs=0", "momentum=0.99",
              f"init_checkpoint={out}/stage1/best",
              f"ckpt_dir={out}/stage2", f"log_dir={out}/stage2/logs"])
    stage2_latest = glob.glob(f"{out}/stage2/*")
    assert stage2_latest, "stage 2 wrote no checkpoint"

    # stage 3 — joint fine-tune from the stage-2 encoder, exp.sh:13-14
    cli_main(["finetune-cl", *tiny, "data.t=4",
              "lr=1e-3", "optimizer=sgd", "lr_scheduler=poly", "num_epochs=1",
              f"pretrain_checkpoint={out}/stage2",
              f"ckpt_dir={out}/stage3", f"log_dir={out}/stage3/logs"])
    assert os.path.isdir(f"{out}/stage3/best")

    # test — evaluation + qualitative viz, exp.sh:17
    cli_main(["test", *tiny, "data.t=4",
              f"test_checkpoint={out}/stage3/best",
              f"log_dir={out}/test", f"viz_dir={out}/test/viz"])
    assert glob.glob(f"{out}/test/viz/*.png"), "no qualitative dumps"

    # the metrics trail: every stage dumped its config and wrote logs
    for stage in ("deeplab", "stage1", "stage2", "stage3"):
        cfg_json = os.path.join(out, stage, "logs", "config.json")
        assert os.path.exists(cfg_json), cfg_json
        json.load(open(cfg_json))
