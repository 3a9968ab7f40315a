"""LibriSpeech preparation: flac -> wav, transcript parsing, JSONL manifests.

Capability parity with the reference (reference: examples/librispeech/
preprocess.py): transcripts from */*/*.trans.txt keyed by utterance id,
lowercased; audio converted from flac to wav alongside; one JSONL manifest
per split directory. Extended beyond the reference's train-clean-100/dev-clean
to cover every downloaded split, plus a merged ``train-960.json`` when all
three training sets are present (flagship config, BASELINE.json configs[4]).

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


def build_json(split_dir: str) -> str:
    transcripts = load_transcripts(split_dir)
    out_path = split_dir + os.path.extsep + "json"
    with open(out_path, "w") as fid:
        for key, text in tqdm.tqdm(sorted(transcripts.items())):
            wave_file = path_from_key(key, split_dir, ext="wav")
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
    parser.add_argument("--skip_convert", action="store_true")
    args = parser.parse_args()
    path = os.path.join(args.output_directory, "LibriSpeech")

    if not args.skip_convert:
        print("Converting files from flac to wave...")
        data_helpers.convert_full_set(path, "*/*/*/*.flac")

    splits = [d for d in sorted(os.listdir(path))
              if os.path.isdir(os.path.join(path, d))]
    manifests = {}
    for split in splits:
        print(f"Preprocessing {split}")
        manifests[split] = build_json(os.path.join(path, split))

    if all(s in manifests for s in TRAIN_960):
        merged = os.path.join(path, "train-960.json")
        with open(merged, "w") as out:
            for s in TRAIN_960:
                with open(manifests[s]) as f:
                    out.write(f.read())
        print(f"Wrote merged 960h manifest: {merged}")


if __name__ == "__main__":
    main()
