#!/bin/bash
# CaDIS (cataract) pipeline for one experiment tag, mirroring
# `segcata/exp_cata.sh` + `pixcontrast_cata/tools/pixpro_cataswintag1.sh`.
set -e
DATA=${DATA:-/data/CaDISv2}
TAG=${TAG:-1}           # 1 | 2 | 3 (8 / 17 / 25 scored classes)
OUT=${OUT:-runs/cadis_tag$TAG}

python -m stswincl_tpu.cli train-seg \
    data.root=$DATA data.dataset=cadis data.tag=$TAG \
    data.batch_size=8 data.t=4 lr=3e-4 optimizer=adam loss=ohem \
    num_epochs=400 "eval_hw=(540,960)" \
    ckpt_dir=$OUT/stage1 log_dir=$OUT/stage1/logs

python -m stswincl_tpu.cli pretrain-contrast \
    data.root=$DATA data.dataset=cadis data.tag=$TAG \
    data.batch_size=4 "data.crop_hw=(256,448)" \
    base_lr=1.0 weight_decay=1e-5 warmup_epochs=5 num_epochs=150 \
    momentum=0.99 init_checkpoint=$OUT/stage1/best \
    ckpt_dir=$OUT/stage2 log_dir=$OUT/stage2/logs

python -m stswincl_tpu.cli finetune-cl \
    data.root=$DATA data.dataset=cadis data.tag=$TAG \
    data.batch_size=8 data.t=4 lr=1e-3 optimizer=sgd lr_scheduler=poly \
    num_epochs=200 "eval_hw=(540,960)" \
    pretrain_checkpoint=$OUT/stage2 \
    ckpt_dir=$OUT/stage3 log_dir=$OUT/stage3/logs

python -m stswincl_tpu.cli test \
    data.root=$DATA data.dataset=cadis data.tag=$TAG \
    test_checkpoint=$OUT/stage3/best log_dir=$OUT/test viz_dir=$OUT/test/viz
