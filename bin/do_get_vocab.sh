#!/usr/bin/env bash
# build bow+rnn vocabularies for a collection (reference bin/do_get_vocab.sh)
set -e
collection=${1:?usage: do_get_vocab.sh <collection> [rootpath] [threshold]}
rootpath=${2:-$HOME/insCar}
threshold=${3:-5}
for text_style in bow rnn; do
    python -m fancyrec_tpu.preprocess.vocab_cli "$collection" \
        --rootpath "$rootpath" --threshold "$threshold" \
        --text_style $text_style --overwrite 0
done
