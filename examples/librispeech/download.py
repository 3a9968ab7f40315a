"""Download LibriSpeech from OpenSLR.

Capability parity with the reference (reference: examples/librispeech/
download.py:11-26), extended to optionally fetch the full 960 h training
sets (the flagship LibriSpeech CTC config trains on 960 h,
BASELINE.json configs[4]).

Usage: python download.py <output_directory> [--full]
The dataset lands in <output_directory>/LibriSpeech.
"""

from __future__ import annotations

import argparse
import os
import tarfile
import urllib.request

EXT = ".tar.gz"
BASE_URL = "http://www.openslr.org/resources/12/"
BASIC = ["raw-metadata", "train-clean-100", "dev-clean"]
FULL_EXTRA = ["train-clean-360", "train-other-500", "dev-other",
              "test-clean", "test-other"]


def download_and_extract(name: str, out_dir: str) -> None:
    in_file = name + EXT
    out_file = os.path.join(out_dir, in_file)
    urllib.request.urlretrieve(BASE_URL + in_file, filename=out_file)
    with tarfile.open(out_file) as tf:
        tf.extractall(path=out_dir)
    os.remove(out_file)


def main():
    parser = argparse.ArgumentParser(description="Download LibriSpeech.")
    parser.add_argument("output_directory")
    parser.add_argument("--full", action="store_true",
                        help="Also fetch the 360h/500h train sets and "
                             "dev-other/test sets (960h total training)")
    args = parser.parse_args()
    names = BASIC + (FULL_EXTRA if args.full else [])
    for name in names:
        print(f"Downloading {name}")
        download_and_extract(name, args.output_directory)


if __name__ == "__main__":
    main()
