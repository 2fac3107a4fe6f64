#!/bin/sh
# Canonical training invocation (reference train.sh: 8 GPUs, batch 96,
# l1=40 vgg=40 mask=20 ctx=0 pl=0). On TPU, parallelism is the device mesh —
# no CUDA_VISIBLE_DEVICES; the same command scales from 1 chip to a pod slice.
if [ "$1" = "1" ]; then
    python -m pasta_gan_tpu.cli.train \
        --outdir ./training-runs-fullbody \
        --data /data/UPT_256 \
        --cfg fashion --batch 96 --l1_weight 40 \
        --vgg_weight 40 \
        --contextual_weight 0 --pl_weight 0 \
        --mask_weight 20 --dtype bfloat16
fi
