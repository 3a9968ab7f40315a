#!/bin/bash
# WSJ data prep (Kaldi-style splits; see examples/wsj/preprocess.py).
# Usage: ./preprocess.sh <path_to_wsj> <path_to_save_jsons>
# Produces train_si284.json (37318 utts), dev_93.json (503), eval_92.json (333).
set -e
wsj_base=$1
save_path=$2

sph_v=sph2pipe_v2.5
if [ ! -x "$sph_v/sph2pipe" ]; then
  wget "http://www.openslr.org/resources/3/${sph_v}.tar.gz"
  tar -xzf "${sph_v}.tar.gz" && rm "${sph_v}.tar.gz"
  (cd "$sph_v" && gcc -o sph2pipe *.c -lm)
fi

PYTHONPATH="$(dirname "$0")/../..:$PYTHONPATH" \
  python "$(dirname "$0")/preprocess.py" "$wsj_base" "$save_path" --convert
