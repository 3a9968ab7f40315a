#!/bin/bash
# TIMIT data prep: convert NIST audio and build JSONL manifests.
# Usage: ./data_prep.sh <path containing timit/>
set -e
timit_path=$1
PYTHONPATH="$(dirname "$0")/../..:$PYTHONPATH" python "$(dirname "$0")/preprocess.py" "$timit_path"
ln -sfn "$timit_path" "$(dirname "$0")/data"
