"""WSJ data preparation: Kaldi-style splits, .dot transcripts, SPHERE -> wav.

Capability parity with the reference recipe (reference: examples/wsj/
preprocess.py): the si284 training set is assembled from the WSJ0+WSJ1 index
files, dev93/eval92 from their .ndx indices; transcripts are parsed from the
.dot files keyed by utterance id; text normalization lowercases, strips
markup/noise tokens, applies the verbalized-punctuation replacements, and
splits "word-dash" compounds; the corrupt wsj0/si_tr_s/401 disk is excluded
from training (reference preprocess.py:122). Expected sizes: train_si284
37318 utts, dev_93 503, eval_92 333 (reference preprocess.sh:17-19).

Usage: python preprocess.py <wsj_base> <save_path> [--convert]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess

import tqdm

from speech_tpu.utils import wave

DATASETS = {
    "train_si284": ["wsj1/doc/indices/si_tr_s.ndx",
                    "wsj0/doc/indices/train/tr_s_wv1.ndx"],
    "eval_92": ["wsj0/doc/indices/test/nvp/si_et_20.ndx"],
    "dev_93": ["wsj1/doc/indices/h1_p0.ndx"],
}
DOT_PATHS = ["wsj0/transcrp/dots/*/*/*.dot",
             "wsj1/trans/wsj1/*/*/*.dot",
             "wsj0/si_et_20/*/*.dot"]

# Verbalized-punctuation normalization (Kaldi-style).
REPLACE = {
    ".point": "point",
    ".period": "period",
    "'single-quote": "single-quote",
    "'single-close-quote": "single-close-quote",
    "`single-quote": "single-quote",
    "-hyphen": "hyphen",
    ")close_paren": "close-paren",
    "(left(-paren)-": "left-",
    ".": "",
    "--dash": "dash",
    "-dash": "dash",
}


def clean(line: str) -> str:
    """Normalize one transcript line (reference preprocess.py:66-82)."""
    line = line.lower()
    line = re.sub(r"<|>|\\|\[\S+\]", "", line)
    toks = []
    for tok in line.split():
        if re.match(r"\S+-dash", tok):
            toks.extend(tok.split("-"))
        else:
            toks.append(REPLACE.get(tok, tok))
    line = " ".join(t for t in toks if t).strip()
    line = re.sub(r"\(\S*\)", "", line)
    line = re.sub(r"[()\*\":\?;!}{\~<>/&,\$\%\~]", "", line)
    line = re.sub("`", "'", line)
    return " ".join(line.split())


def load_text(wsj_base: str) -> dict[str, str]:
    """utterance id -> normalized transcript, from all .dot files."""
    transcripts: dict[str, str] = {}
    for pattern in DOT_PATHS:
        for f in glob.glob(os.path.join(wsj_base, pattern)):
            with open(f, errors="replace") as fid:
                for line in fid:
                    toks = line.strip().split()
                    if not toks:
                        continue
                    # last token is "(utt_id)"
                    key = toks[-1][1:-1]
                    transcripts[key] = clean(" ".join(toks[:-1]))
    return transcripts


def load_waves(wsj_base: str, index_files: list[str],
               ext: str = ".wav") -> list[str]:
    """Expand .ndx index files into audio paths (reference
    preprocess.py:53-64). ``ext=".wv1"`` keeps the original
    embedded-shorten SPHERE files, which utils.wave reads in place."""
    waves = []
    for f in index_files:
        with open(os.path.join(wsj_base, f)) as fid:
            lines = [l for l in fid if l and l[0] != ";"]
        paths = (l.split(":")[1].strip().strip("/") for l in lines)
        paths = (os.path.join(wsj_base, p) for p in paths)
        paths = (os.path.splitext(p)[0] + ext for p in paths)
        waves.extend(sorted(paths))
    return waves


def convert_sph_to_wav(files: list[str], sph2pipe: str = "sph2pipe_v2.5/sph2pipe"):
    for out_f in tqdm.tqdm(files):
        sph_f = os.path.splitext(out_f)[0] + ".wv1"
        subprocess.call([sph2pipe, "-p", "-f", "wav", "-c", "1", sph_f, out_f])


def write_json(save_path: str, dataset: str, waves: list[str],
               transcripts: dict[str, str]) -> None:
    with open(os.path.join(save_path, dataset + ".json"), "w") as fid:
        for wave_file in tqdm.tqdm(waves):
            key = os.path.splitext(os.path.basename(wave_file))[0]
            fid.write(json.dumps({
                "text": transcripts[key],
                "duration": wave.wav_duration(wave_file),
                "audio": wave_file,
            }) + "\n")


def main():
    parser = argparse.ArgumentParser(description="Preprocess the WSJ dataset.")
    parser.add_argument("wsj_base", help="Path where the dataset is stored")
    parser.add_argument("save_path", help="Path to save dataset jsons")
    parser.add_argument("--convert", action="store_true",
                        help="Convert SPHERE .wv1 to wav first (sph2pipe)")
    parser.add_argument("--native_sphere", action="store_true",
                        help="Manifest the original .wv1 embedded-shorten "
                             "SPHERE files in place (decoded natively by "
                             "speech_tpu.utils.shorten; no sph2pipe needed)")
    args = parser.parse_args()
    if args.convert and args.native_sphere:
        parser.error("--convert and --native_sphere are mutually exclusive")

    transcripts = load_text(args.wsj_base)
    for name, index_files in DATASETS.items():
        waves = load_waves(args.wsj_base, index_files,
                           ext=".wv1" if args.native_sphere else ".wav")
        if args.convert:
            print(f"Converting {name}")
            convert_sph_to_wav(waves)
        if name == "train_si284":
            # corrupt disk (reference preprocess.py:122)
            waves = [w for w in waves if "wsj0/si_tr_s/401" not in w]
        print(f"Writing {name}")
        write_json(args.save_path, name, waves, transcripts)


if __name__ == "__main__":
    main()
