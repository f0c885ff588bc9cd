#!/usr/bin/env bash
# txt feature files -> BigFile (reference bin/do_txt2bin.sh, path drift fixed)
set -e
feat_dim=${1:?usage: do_txt2bin.sh <dim> <inputTextFile> <isFileList> <resultDir> [overwrite]}
python -m fancyrec_tpu.preprocess.txt2bin "$1" "$2" "$3" "$4" --overwrite "${5:-0}"
