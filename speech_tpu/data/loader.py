"""Length-bucketed, static-shape batch loading with threaded prefetch.

Capability parity with the reference's dataset/sampler/loader (reference:
speech/loader.py:87-150): utterances are bucketed by label length
(bucket_diff=4), sorted within buckets by (rounded duration, label length) so
consecutive fixed-size batches are length-homogeneous, and batch *order* is
shuffled each epoch (reference BatchRandomSampler, loader.py:120-137).

TPU-first differences:
  * Batches are padded to quantized shapes — time padded up to a multiple of
    ``time_mult`` frames and labels to a multiple of ``label_mult`` — so XLA
    sees a small, bounded set of compiled shapes instead of one per batch.
  * True per-utterance lengths ride along (``input_lengths`` pre-conv frame
    counts, ``label_lengths``), so losses mask padding exactly instead of the
    reference's max-length quirk (reference ctc_model.py:43-45).
  * Prefetch uses a thread pool (the reference forks 4 DataLoader worker
    processes, loader.py:147); numpy FFT releases the GIL so threads overlap
    feature extraction with device compute.
  * Epoch shuffling is seeded and reproducible (multi-host lockstep requires
    identical batch order on every host).

A batch is a dict of numpy arrays:
  ``inputs``         (B, T_pad, F) float32 normalized log-spectrograms
  ``input_lengths``  (B,) int32 true frame counts (pre-convolution)
  ``labels``         (B, U_pad) int32, zero-padded
  ``label_lengths``  (B,) int32 true label lengths
"""

from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
import random
from typing import Iterator, Optional

import numpy as np

from speech_tpu.data.manifest import read_data_json
from speech_tpu.data.preprocessor import Preprocessor


def round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


class AudioDataset:
    """Bucketed, duration-sorted view of a JSONL manifest."""

    def __init__(self, data_json: str, preproc: Preprocessor, batch_size: int,
                 bucket_diff: int = 4):
        data = read_data_json(data_json)
        self.preproc = preproc
        self.batch_size = batch_size

        max_len = max(len(x["text"]) for x in data)
        num_buckets = max(1, max_len // bucket_diff)
        buckets: list[list] = [[] for _ in range(num_buckets)]
        for d in data:
            bid = min(len(d["text"]) // bucket_diff, num_buckets - 1)
            buckets[bid].append(d)
        sort_fn = lambda x: (round(x["duration"], 1), len(x["text"]))
        for b in buckets:
            b.sort(key=sort_fn)
        self.data = [d for b in buckets for d in b]

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, list[int]]:
        datum = self.data[idx]
        return self.preproc.preprocess(datum["audio"], datum["text"])


def _collate(examples: list[tuple[np.ndarray, list[int]]], time_mult: int,
             label_mult: int, t_pad: Optional[int] = None,
             u_pad: Optional[int] = None) -> dict[str, np.ndarray]:
    """Pad a list of (features, label_ids) to quantized static shapes.
    ``t_pad``/``u_pad`` force the padded shape (multi-host lockstep)."""
    b = len(examples)
    feat_dim = examples[0][0].shape[1]
    t_lens = np.array([x.shape[0] for x, _ in examples], dtype=np.int32)
    u_lens = np.array([len(y) for _, y in examples], dtype=np.int32)
    if t_pad is None:
        t_pad = round_up(int(t_lens.max()), time_mult)
    elif int(t_lens.max()) > t_pad:
        # Forced shapes come from manifest-duration estimates (multi-host
        # lockstep); a coarse duration can under-estimate. Fail loudly rather
        # than silently truncating audio (ADVICE r2).
        raise ValueError(
            f"actual frame count {int(t_lens.max())} exceeds the forced t_pad "
            f"{t_pad} estimated from manifest durations; increase the "
            f"manifest's duration precision or the loader headroom")
    if u_pad is None:
        u_pad = round_up(max(int(u_lens.max()), 1), label_mult)
    inputs = np.zeros((b, t_pad, feat_dim), dtype=np.float32)
    labels = np.zeros((b, u_pad), dtype=np.int32)
    for i, (x, y) in enumerate(examples):
        inputs[i, : x.shape[0]] = x
        labels[i, : len(y)] = y
    return {
        "inputs": inputs,
        "input_lengths": t_lens,
        "labels": labels,
        "label_lengths": u_lens,
    }


class Loader:
    """Iterable over an epoch of static-shape batches, with threaded prefetch.

    Multi-host data parallelism (SURVEY §2.2 DP row): pass
    ``process_shard=(jax.process_index(), jax.process_count())`` and each host
    featurizes ONLY its row-slice of every global batch — batch *order* stays
    in lockstep across hosts (same seed), and padded shapes are computed from
    manifest metadata alone so every host compiles the same shapes without
    seeing the other hosts' audio. Feed the local slices to
    ``parallel.shard_batch`` which assembles the global array via
    ``jax.make_array_from_process_local_data``.
    """

    def __init__(self, dataset: AudioDataset, batch_size: int,
                 num_workers: int = 4, time_mult: int = 100,
                 label_mult: int = 8, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 4, native: bool = True,
                 process_shard: tuple[int, int] = (0, 1),
                 raw_audio: bool = False, pad_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.native = native
        self.raw_audio = raw_audio
        self.pad_last = pad_last
        self.num_workers = max(1, num_workers)
        self.time_mult = time_mult
        self.label_mult = label_mult
        self.seed = seed
        self.epoch = 0
        self.prefetch = max(1, prefetch)
        self.process_index, self.process_count = process_shard
        if self.process_count > 1 and batch_size % self.process_count:
            raise ValueError(
                f"global batch_size {batch_size} not divisible by "
                f"process_count {self.process_count}")
        if self.pad_last and self.process_count > 1:
            # pad_last attaches a GLOBAL _n_valid while each host holds a
            # local row-slice (all duplicate rows land on the last host), so
            # consumers that treat _n_valid as a local count would mis-slice.
            # No caller combines these today (dev/eval loaders are unsharded);
            # refuse rather than let the API mislead (ADVICE r3).
            raise ValueError(
                "pad_last is incompatible with process-sharded loading: "
                "_n_valid would be a global count against local row slices; "
                "use an unsharded eval loader (parallel.eval shards work, "
                "not rows)")
        n = len(dataset)
        end = n - batch_size + 1 if drop_last else n
        self.batches = [list(range(i, min(i + batch_size, n)))
                        for i in range(0, max(end, 0), batch_size)]
        if self.process_count > 1:
            # Sharded iteration needs full batches (equal local slices).
            self.batches = [b for b in self.batches if len(b) == batch_size]

    def __len__(self) -> int:
        return len(self.batches)

    def _sample_rate(self) -> int:
        """Probe (and cache) the corpus sample rate from one audio header
        (RIFF, NIST SPHERE, or FLAC — utils/wave dispatches by magic)."""
        sr = getattr(self, "_sr", None)
        if sr is None:
            from speech_tpu.utils import wave as stw

            first = self.dataset.data[0]["audio"]
            kind = stw._sniff(first)
            if kind == "sphere":
                _, sr = stw._read_sphere(first, header_only=True)
            elif kind == "flac":
                from speech_tpu.utils.flac import flac_info

                sr = flac_info(first)["sample_rate"]
            else:
                import wave as wave_mod

                with wave_mod.open(first, "rb") as w:
                    sr = w.getframerate()
            self._sr = sr
        return sr

    def _global_pad_shapes(self, idxs: list[int]) -> tuple[int, int]:
        """(t_pad, u_pad) for a GLOBAL batch from manifest metadata only, so
        every host computes identical shapes without reading the other hosts'
        audio. Frame counts are estimated from the manifest duration (+1 frame
        of headroom absorbs duration-rounding error)."""
        from speech_tpu.data import features as F

        sr = self._sample_rate()
        data = [self.dataset.data[i] for i in idxs]
        est = max(F.num_frames(int(round(d["duration"] * sr)), sr)
                  for d in data)
        t_pad = round_up(est + 1, self.time_mult)
        off = 2 if self.dataset.preproc.start_and_end else 0
        u = max(len(list(d["text"])) + off for d in data)
        u_pad = round_up(max(u, 1), self.label_mult)
        return t_pad, u_pad

    def _make_batch(self, idxs: list[int]) -> dict[str, np.ndarray]:
        t_pad = u_pad = None
        n_valid = len(idxs)
        if self.pad_last and n_valid < self.batch_size:
            # Repeat rows to the full batch size so XLA sees ONE compiled
            # shape per bucket instead of one extra program for the ragged
            # final batch (each compile costs minutes on a remote TPU).
            # Consumers slice by ``_n_valid``; eval losses are per-utterance.
            idxs = list(idxs) + [idxs[-1]] * (self.batch_size - n_valid)
        if self.process_count > 1:
            t_pad, u_pad = self._global_pad_shapes(idxs)
            k = len(idxs) // self.process_count
            idxs = idxs[self.process_index * k:(self.process_index + 1) * k]
        if self.raw_audio:
            batch = self._make_batch_raw(idxs, t_pad, u_pad)
        else:
            batch = self._make_batch_native(idxs, t_pad, u_pad) \
                if self.native else None
            if batch is None:
                examples = [self.dataset[i] for i in idxs]
                batch = _collate(examples, self.time_mult, self.label_mult,
                                 t_pad, u_pad)
        if self.pad_last:
            batch["_n_valid"] = n_valid
        return batch

    def _encode_labels(self, data: list[dict], u_pad: Optional[int]
                       ) -> tuple[np.ndarray, np.ndarray]:
        preproc = self.dataset.preproc
        labels_list = [preproc.encode(d["text"]) for d in data]
        u_lens = np.array([len(y) for y in labels_list], dtype=np.int32)
        if u_pad is None:
            u_pad = round_up(max(int(u_lens.max()), 1), self.label_mult)
        labels = np.zeros((len(data), u_pad), dtype=np.int32)
        for i, y in enumerate(labels_list):
            labels[i, : len(y)] = y
        return labels, u_lens

    def _make_batch_raw(self, idxs: list[int], t_pad: Optional[int] = None,
                        u_pad: Optional[int] = None) -> dict[str, np.ndarray]:
        """Raw-waveform batch for the on-device featurization frontend
        (data.frontend.OnDeviceFrontend): ships ``waveforms`` (B, S_pad)
        float32 instead of host features; featurization happens inside the
        jitted step. S_pad is derived from the frame budget so the frontend
        produces exactly t_pad frames."""
        from speech_tpu.data import features as F
        from speech_tpu.data.frontend import samples_for_frames
        from speech_tpu.utils import wave

        data = [self.dataset.data[i] for i in idxs]
        sr = self._sample_rate()
        auds = []
        for d in data:
            a, file_sr = wave.array_from_wave(d["audio"])
            if file_sr != sr:
                # Mixed rates would silently mis-frame and mis-featurize the
                # whole batch (the shared frontend assumes one corpus rate) —
                # mirror the native kernel's rate-mismatch error (ADVICE r2).
                raise IOError(
                    f"sample rate {file_sr} of {d['audio']} != corpus rate "
                    f"{sr}; resample the corpus to one rate for the "
                    f"raw-waveform path")
            if a.ndim > 1:
                a = a.mean(axis=-1)
            auds.append(np.asarray(a, np.float32))
        t_lens = np.array([F.num_frames(a.shape[0], sr) for a in auds],
                          dtype=np.int32)
        if t_pad is None:
            t_pad = round_up(int(t_lens.max()), self.time_mult)
        elif int(t_lens.max()) > t_pad:
            # Forced t_pad is a manifest-duration estimate; mirror the
            # featurized path's contract (_collate) — fail loudly rather
            # than silently truncating audio at s_pad (ADVICE r3).
            raise ValueError(
                f"actual frame count {int(t_lens.max())} exceeds the forced "
                f"t_pad {t_pad} estimated from manifest durations; increase "
                f"the manifest's duration precision or the loader headroom")
        s_pad = samples_for_frames(t_pad, sr)
        wavs = np.zeros((len(data), s_pad), dtype=np.float32)
        for i, a in enumerate(auds):
            n = min(a.shape[0], s_pad)
            wavs[i, :n] = a[:n]
        labels, u_lens = self._encode_labels(data, u_pad)
        return {"waveforms": wavs, "input_lengths": t_lens,
                "labels": labels, "label_lengths": u_lens}

    def _make_batch_native(self, idxs: list[int], t_pad: Optional[int] = None,
                           u_pad: Optional[int] = None
                           ) -> Optional[dict[str, np.ndarray]]:
        """Featurize a whole batch with the native C++ thread pool (wav decode
        + STFT + log + normalize outside the GIL — speech_tpu/native/
        featurizer.cc). Returns None to fall back on any error (non-PCM file,
        sample-rate mismatch), keeping behavior identical to the numpy path."""
        from speech_tpu.native import featurizer as native

        if not native.available():
            return None
        preproc = self.dataset.preproc
        if getattr(preproc, "feature_type", "logspec") != "logspec":
            # The native kernel computes log-spectrograms only; logmel configs
            # must take the numpy path (matches the guard in
            # Preprocessor.preprocess; ADVICE r2).
            return None
        data = [self.dataset.data[i] for i in idxs]
        try:
            if t_pad is None:
                t_max = max(native.num_frames_file(d["audio"]) for d in data)
                t_pad = round_up(t_max, self.time_mult)
            inputs, t_lens = native.featurize_batch(
                [d["audio"] for d in data], t_pad, preproc.input_dim,
                mean=preproc.mean, std=preproc.std)
        except IOError:
            return None
        labels, u_lens = self._encode_labels(data, u_pad)
        return {"inputs": inputs, "input_lengths": t_lens,
                "labels": labels, "label_lengths": u_lens}

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        order = list(self.batches)
        random.Random(self.seed + self.epoch).shuffle(order)
        self.epoch += 1
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            pending = collections.deque()
            it = iter(order)
            for idxs in it:
                pending.append(pool.submit(self._make_batch, idxs))
                if len(pending) >= self.prefetch:
                    break
            while pending:
                fut = pending.popleft()
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(pool.submit(self._make_batch, nxt))
                yield fut.result()
        finally:
            # Abandoned mid-epoch (break in a train loop): drop queued work and
            # don't block generator close on in-flight features. If the
            # generator is only collected at interpreter teardown, stdlib
            # modules may already be gone — nothing to clean up then.
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:
                pass


def make_loader(dataset_json: str, preproc: Preprocessor, batch_size: int,
                num_workers: int = 4, time_mult: int = 100, label_mult: int = 8,
                seed: int = 0, drop_last: bool = True,
                dataset: Optional[AudioDataset] = None,
                process_shard: tuple[int, int] = (0, 1),
                raw_audio: bool = False, pad_last: bool = False) -> Loader:
    """Build a Loader over a manifest (reference make_loader, loader.py:139-150).

    ``process_shard=(process_index, process_count)`` enables per-host input
    sharding for multi-host DP: each host featurizes only its slice of every
    global batch (see Loader docstring). ``pad_last`` repeats rows of a ragged
    final batch up to ``batch_size`` (attaching ``_n_valid``) so eval pays one
    compile per bucket shape."""
    if dataset is None:
        dataset = AudioDataset(dataset_json, preproc, batch_size)
    return Loader(dataset, batch_size, num_workers=num_workers,
                  time_mult=time_mult, label_mult=label_mult, seed=seed,
                  drop_last=drop_last, process_shard=process_shard,
                  raw_audio=raw_audio, pad_last=pad_last)
