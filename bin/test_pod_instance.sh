#!/usr/bin/env bash
# Evaluate a trained run at scale (counterpart of the reference
# bin/test_public_cluster.sh single-GPU submission): the tester shards the
# encode batches and the posts axis over every local device by default
# (override with MESH_SHAPE, e.g. MESH_SHAPE=8,1). Run on one host; eval
# is single-process data-parallel.
#
# Usage: test_pod_instance.sh <postfix> [checkpoint_name]
set -e

rootpath=${ROOTPATH:-$HOME/insCar}
testCollection=insCartest
logger_name=$rootpath/model/$1
n_caption=1
overwrite=1
batch_size=64
checkpoint_name=${2:-model_best.pth.tar}

python -m fancyrec_tpu.eval.tester $testCollection --rootpath "$rootpath" \
    --overwrite $overwrite --n_caption $n_caption --batch_size $batch_size \
    --mesh_shape "${MESH_SHAPE:-}" \
    --logger_name "$logger_name" --checkpoint_name "$checkpoint_name"
