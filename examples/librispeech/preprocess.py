"""LibriSpeech preparation: transcript parsing + JSONL manifests.

Capability parity with the reference (reference: examples/librispeech/
preprocess.py): transcripts from */*/*.trans.txt keyed by utterance id,
lowercased; one JSONL manifest per split directory. Extended beyond the
reference's train-clean-100/dev-clean to cover every downloaded split, plus
a merged ``train-960.json`` when all three training sets are present
(flagship config, BASELINE.json configs[4]).

Unlike the reference (which converts flac -> wav up front with ffmpeg,
reference preprocess.py:38-39), manifests point at the .flac files in place:
the data pipeline decodes FLAC natively (speech_tpu/native/flacdec.cc with a
pure-Python fallback), so no external conversion tools are needed. Pass
``--convert_wav`` to get the reference's conversion flow instead (requires
ffmpeg/avconv).

Usage: python preprocess.py <output_directory>  (expects
<output_directory>/LibriSpeech as produced by download.py)
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import tqdm

from speech_tpu.utils import data_helpers, wave

TRAIN_960 = ["train-clean-100", "train-clean-360", "train-other-500"]


def load_transcripts(path: str) -> dict[str, str]:
    data = {}
    for f in glob.glob(os.path.join(path, "*/*/*.trans.txt")):
        with open(f) as fid:
            for line in fid:
                toks = line.strip().split()
                if toks:
                    data[toks[0]] = " ".join(toks[1:]).lower()
    return data


def path_from_key(key: str, prefix: str, ext: str) -> str:
    dirs = key.split("-")
    dirs[-1] = key
    return os.path.join(prefix, *dirs) + os.path.extsep + ext


def build_json(split_dir: str, ext: str = "flac") -> str:
    transcripts = load_transcripts(split_dir)
    out_path = split_dir + os.path.extsep + "json"
    with open(out_path, "w") as fid:
        for key, text in tqdm.tqdm(sorted(transcripts.items())):
            wave_file = path_from_key(key, split_dir, ext=ext)
            fid.write(json.dumps({
                "text": text,
                "duration": wave.wav_duration(wave_file),
                "audio": wave_file,
            }) + "\n")
    return out_path


def main():
    parser = argparse.ArgumentParser(description="Preprocess LibriSpeech.")
    parser.add_argument("output_directory",
                        help="Directory containing LibriSpeech/")
    parser.add_argument("--convert_wav", action="store_true",
                        help="Convert flac->wav up front (the reference's "
                             "flow; needs ffmpeg) instead of reading FLAC "
                             "natively")
    args = parser.parse_args()
    path = os.path.join(args.output_directory, "LibriSpeech")

    if args.convert_wav:
        print("Converting files from flac to wave...")
        data_helpers.convert_full_set(path, "*/*/*/*.flac")

    splits = [d for d in sorted(os.listdir(path))
              if os.path.isdir(os.path.join(path, d))]
    manifests = {}
    for split in splits:
        print(f"Preprocessing {split}")
        manifests[split] = build_json(os.path.join(path, split),
                                      ext="wav" if args.convert_wav else "flac")

    if all(s in manifests for s in TRAIN_960):
        merged = os.path.join(path, "train-960.json")
        with open(merged, "w") as out:
            for s in TRAIN_960:
                with open(manifests[s]) as f:
                    out.write(f.read())
        print(f"Wrote merged 960h manifest: {merged}")


if __name__ == "__main__":
    main()
