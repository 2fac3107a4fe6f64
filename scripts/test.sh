#!/bin/sh
# Canonical inference invocations (reference test.sh: 256 batch 16 / 512 batch 8).
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
