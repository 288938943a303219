#!/bin/bash
# Full EndoVis2018 three-stage pipeline with the reference's canonical
# hyperparameters (`seg18/exp.sh`, `pixcontrast_18/tools/pixpro_swin_ver.sh`).
# Set DATA to the processed dataset root (see
# stswincl_tpu/data/prepare_endovis.py for raw-release conversion).
set -e
DATA=${DATA:-/data/ead2018}
OUT=${OUT:-runs/endovis18}

# (optional pre-stage) DeepLab ResNet-init pretraining, exp.sh:3-8
python -m stswincl_tpu.cli train-seg \
    data.root=$DATA model.arch=puredeeplab18 data.t=1 \
    lr=3e-4 optimizer=adam loss=ohem num_epochs=100 \
    ckpt_dir=$OUT/deeplab log_dir=$OUT/deeplab/logs

# stage 1 — intra-video supervised training, exp.sh:3-4
python -m stswincl_tpu.cli train-seg \
    data.root=$DATA data.batch_size=8 data.t=4 \
    lr=3e-4 optimizer=adam loss=ohem num_epochs=400 \
    init_checkpoint=$OUT/deeplab/best \
    ckpt_dir=$OUT/stage1 log_dir=$OUT/stage1/logs

# stage 2 — inter-video contrastive pretraining, pixpro_swin_ver.sh:9-40
# (optional: add data.rand_augment=rand-m9-mstd0.5 for the RandAugment
#  menu the reference ships unwired)
python -m stswincl_tpu.cli pretrain-contrast \
    data.root=$DATA data.batch_size=4 "data.crop_hw=(256,448)" \
    base_lr=1.0 weight_decay=1e-5 warmup_epochs=5 num_epochs=150 \
    momentum=0.99 init_checkpoint=$OUT/stage1/best \
    ckpt_dir=$OUT/stage2 log_dir=$OUT/stage2/logs

# stage 3 — joint fine-tune, exp.sh:13-14
python -m stswincl_tpu.cli finetune-cl \
    data.root=$DATA data.batch_size=8 data.t=4 \
    lr=1e-3 optimizer=sgd lr_scheduler=poly num_epochs=200 \
    pretrain_checkpoint=$OUT/stage2 \
    ckpt_dir=$OUT/stage3 log_dir=$OUT/stage3/logs

# test — full-resolution evaluation, exp.sh:17
# (streaming_eval=true serves sliding-window frames through the
#  feature-cached StreamingSegmenter: identical metrics, ~2x faster)
python -m stswincl_tpu.cli test \
    data.root=$DATA test_checkpoint=$OUT/stage3/best log_dir=$OUT/test viz_dir=$OUT/test/viz
