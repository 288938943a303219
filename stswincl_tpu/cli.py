"""Command-line entry points mirroring the reference's flows.

  python -m stswincl_tpu.cli train-seg        (stage 1 — train_swin.py /
                                               train_cata_swin.py)
  python -m stswincl_tpu.cli pretrain-contrast (stage 2 —
                                               main_pretrain_swinv5.py)
  python -m stswincl_tpu.cli finetune-cl      (stage 3 —
                                               train_CL_ft_mswin_sgd_minput.py)
  python -m stswincl_tpu.cli test             (test.py / cata_test.py)

Config comes from an optional JSON file (`--config`) plus `key=value`
overrides, replacing argparse+shell-script config (SURVEY.md §5).
"""

from __future__ import annotations

import argparse
import sys

from stswincl_tpu.configs import (
    SegTrainConfig,
    ContrastTrainConfig,
    load_config,
    apply_overrides,
    to_json,
)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="stswincl_tpu")
    parser.add_argument("command", choices=[
        "train-seg", "pretrain-contrast", "finetune-cl", "test"])
    parser.add_argument("--config", default=None, help="JSON config file")
    parser.add_argument("overrides", nargs="*",
                        help="key=value config overrides (e.g. data.root=/x)")
    args = parser.parse_args(argv)

    if args.command in ("train-seg", "finetune-cl", "test"):
        cfg = (load_config(SegTrainConfig, args.config)
               if args.config else SegTrainConfig())
    else:
        cfg = (load_config(ContrastTrainConfig, args.config)
               if args.config else ContrastTrainConfig())
    cfg = apply_overrides(cfg, args.overrides)

    if args.command == "finetune-cl":
        # stage-3 defaults when not overridden: SGD poly 1e-3 / 200 epochs
        if not args.config and not any(
                o.startswith(("optimizer", "lr", "num_epochs"))
                for o in args.overrides):
            cfg.optimizer, cfg.lr = "sgd", 1e-3
            cfg.lr_scheduler, cfg.num_epochs = "poly", 200

    print(to_json(cfg))
    if args.command in ("train-seg", "finetune-cl"):
        from stswincl_tpu.pipelines.seg import run_seg_training
        run_seg_training(cfg)
    elif args.command == "pretrain-contrast":
        from stswincl_tpu.pipelines.contrast import run_contrast_pretraining
        run_contrast_pretraining(cfg)
    elif args.command == "test":
        from stswincl_tpu.pipelines.evaluate import run_test
        run_test(cfg)


if __name__ == "__main__":
    main()
