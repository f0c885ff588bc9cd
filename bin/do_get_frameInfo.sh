#!/usr/bin/env bash
# build video2frames.txt for a feature dir (reference bin/do_get_frameInfo.sh)
set -e
python -m fancyrec_tpu.preprocess.frameinfo --feature_dir "${1:?feature dir}" --overwrite "${2:-0}"
