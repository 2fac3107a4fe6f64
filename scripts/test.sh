#!/bin/sh
# Canonical inference invocations (reference test.sh: 256 batch 16 / 512 batch 8).
# Add `--quant int8_static` for the int8 serving mode (1.46x forward; see
# BASELINE.md round-3 serving section for the quality delta).
if [ "$1" = "1" ]; then
    python -m pasta_gan_tpu.cli.test \
        --network ./checkpoints/network-snapshot-004000 \
        --dataroot /data/UPT_test \
        --outdir ./test_results/256 --batchsize 16
elif [ "$1" = "2" ]; then
    python -m pasta_gan_tpu.cli.test_512 \
        --network ./checkpoints/network-snapshot-005010 \
        --dataroot /data/UPT_512_test \
        --outdir ./test_results/512 --batchsize 8 --change_region fullbody
fi
