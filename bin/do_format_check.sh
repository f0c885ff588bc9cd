#!/usr/bin/env bash
# verify BigFile feature dirs (the reference's format_check.py was missing
# from its tree; fancyrec_tpu.io.format_check is the real tool)
set -e
python -m fancyrec_tpu.io.format_check "$@"
