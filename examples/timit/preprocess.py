"""TIMIT data preparation: NIST sphere -> wav, phone mapping, JSONL manifests.

Capability parity with the reference recipe (reference: examples/timit/
preprocess.py): 61->48 phone mapping for training targets (the standard
phones.60-48-39.map table), removal of the per-speaker-identical "sa"
sentences, the 24-speaker core test split from timit/readme.doc, a
50-speaker dev split drawn from the remaining test speakers, and JSONL
manifests with phoneme-list texts. Differences by design: the dev-speaker
draw is seeded (the reference's is not and its py2 ``dict.keys().remove``
crashes on py3 — SURVEY §5 quirks), and conversion uses ffmpeg/avconv via
speech_tpu.utils.

Usage: python preprocess.py <dir containing timit/> [--seed 2017]
Produces <dir>/timit/{train,dev,test}.json.
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import random

import tqdm

from speech_tpu.utils import data_helpers, wave

WAV_EXT = "wv"  # NIST files already use .wav for sphere data

# Core test set speakers, from timit/readme.doc.
TEST_SPEAKERS = [
    "mdab0", "mwbt0", "felc0", "mtas1", "mwew0", "fpas0",
    "mjmp0", "mlnt0", "fpkt0", "mlll0", "mtls0", "fjlm0",
    "mbpm0", "mklt0", "fnlp0", "mcmj0", "mjdh0", "fmgd0",
    "mgrt0", "mnjm0", "fdhc0", "mjln0", "mpam0", "fmld0",
]

_MAP_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "phones.60-48-39.map")


def load_phone_map() -> tuple[dict, dict]:
    """(61->48, 48->39) phone maps; rows with fewer than 3 columns are
    phones dropped entirely (e.g. glottal stop q)."""
    with open(_MAP_FILE) as fid:
        rows = [line.strip().split() for line in fid]
    rows = [r for r in rows if len(r) == 3]
    return ({r[0]: r[1] for r in rows}, {r[1]: r[2] for r in rows})


def load_transcripts(path: str) -> dict[str, list[str]]:
    """utterance .phn file -> 48-phone list; 'sa' sentences removed."""
    m60_48, _ = load_phone_map()
    out = {}
    for f in glob.glob(os.path.join(path, "*/*/*.phn")):
        if os.path.basename(f)[:2] == "sa":
            continue
        with open(f) as fid:
            raw = [line.strip().split()[-1] for line in fid if line.strip()]
        out[f] = [m60_48[p] for p in raw if p in m60_48]
    return out


def split_by_speaker(data: dict, dev_speakers: int = 50, seed: int = 2017):
    """Split the TIMIT test portion into a seeded 50-speaker dev set and the
    24-speaker core test set."""
    speaker_of = lambda f: os.path.basename(os.path.dirname(f))
    by_speaker = collections.defaultdict(list)
    for k, v in data.items():
        by_speaker[speaker_of(k)].append((k, v))
    others = sorted(s for s in by_speaker if s not in TEST_SPEAKERS)
    random.Random(seed).shuffle(others)
    dev = dict(kv for s in others[:dev_speakers] for kv in by_speaker[s])
    test = dict(kv for s in TEST_SPEAKERS for kv in by_speaker[s])
    return dev, test


def build_json(data: dict, path: str, set_name: str,
               native_sphere: bool = False) -> None:
    out_path = os.path.join(path, set_name + os.path.extsep + "json")
    with open(out_path, "w") as fid:
        for phn_file, phones in tqdm.tqdm(sorted(data.items())):
            ext = "wav" if native_sphere else WAV_EXT
            wave_file = os.path.splitext(phn_file)[0] + os.path.extsep + ext
            fid.write(json.dumps({
                "text": phones,
                "duration": wave.wav_duration(wave_file),
                "audio": wave_file,
            }) + "\n")


def main():
    parser = argparse.ArgumentParser(description="Preprocess the TIMIT dataset.")
    parser.add_argument("output_directory",
                        help="Directory containing the extracted timit/ tree")
    parser.add_argument("--seed", type=int, default=2017,
                        help="Seed for the dev-speaker draw")
    parser.add_argument("--skip_convert", action="store_true",
                        help="Skip NIST->wav conversion (already done)")
    parser.add_argument("--native_sphere", action="store_true",
                        help="Skip conversion entirely and point manifests at "
                             "the original NIST SPHERE files (utils/wave.py "
                             "reads uncompressed SPHERE natively, like the "
                             "reference's soundfile)")
    args = parser.parse_args()

    path = os.path.abspath(os.path.join(args.output_directory, "timit"))
    if not (args.skip_convert or args.native_sphere):
        print("Converting files from NIST to standard wave format...")
        data_helpers.convert_full_set(path, "*/*/*/*.wav", new_ext=WAV_EXT)

    print("Preprocessing train")
    build_json(load_transcripts(os.path.join(path, "train")), path, "train",
               native_sphere=args.native_sphere)

    print("Preprocessing dev/test")
    transcripts = load_transcripts(os.path.join(path, "test"))
    dev, test = split_by_speaker(transcripts, seed=args.seed)
    build_json(dev, path, "dev", native_sphere=args.native_sphere)
    build_json(test, path, "test", native_sphere=args.native_sphere)


if __name__ == "__main__":
    main()
