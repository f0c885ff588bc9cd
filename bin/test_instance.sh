#!/usr/bin/env bash
# Evaluate a trained checkpoint (mirror of reference bin/test_instance.sh).
set -e
rootpath=${ROOTPATH:-$HOME/insCar}
testCollection=insCartest
postfix=${1:-ph_cl_mean_0001_without_prune}

python -m fancyrec_tpu.eval.tester $testCollection \
    --rootpath "$rootpath" \
    --logger_name "$rootpath/model/$postfix" \
    --checkpoint_name model_best.pth.tar \
    --batch_size 128
