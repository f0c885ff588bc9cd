#!/usr/bin/env bash
# Evaluate a specific epoch checkpoint on a CPU dev box (counterpart of the
# reference bin/test_mac.sh). Forces the CPU backend even when a TPU plugin
# is present (the plugin ignores JAX_PLATFORMS; only the config knob works).
#
# Usage: test_cpu.sh <epoch> [postfix]
set -e

rootpath=${ROOTPATH:-$HOME/insCar}
testCollection=insCartest
logger_name=$rootpath/model/${2:-runs_0}
n_caption=1
overwrite=1
batch_size=8
checkpoint_name=checkpoint_epoch_$1.pth.tar

python - "$testCollection" <<EOF
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from fancyrec_tpu.eval import tester
tester.main([
    sys.argv[1],
    "--rootpath", "$rootpath", "--overwrite", "$overwrite",
    "--logger_name", "$logger_name", "--n_caption", "$n_caption",
    "--batch_size", "$batch_size", "--checkpoint_name", "$checkpoint_name",
])
EOF
