"""Per-host sharded input pipeline (SURVEY §2.2 DP row, §7 hard part 6).

Simulates N hosts by constructing Loaders with explicit
``process_shard=(i, N)`` and checks:
  * batch order and padded shapes are identical across hosts (lockstep),
  * concatenating the hosts' local slices reproduces the global batch,
  * each host touches ONLY its own shard's audio files.
"""

import numpy as np
import pytest

from speech_tpu.data.loader import Loader, make_loader
from speech_tpu.data.preprocessor import Preprocessor


def _loaders(tiny_corpus, n_hosts, batch_size=4, **kw):
    preproc = Preprocessor(tiny_corpus["manifest"], start_and_end=False, seed=0)
    full = make_loader(tiny_corpus["manifest"], preproc, batch_size, seed=3,
                       num_workers=1, **kw)
    hosts = [make_loader(tiny_corpus["manifest"], preproc, batch_size, seed=3,
                         num_workers=1, process_shard=(i, n_hosts), **kw)
             for i in range(n_hosts)]
    return full, hosts


def test_local_slices_reassemble_global(tiny_corpus):
    full, (h0, h1) = _loaders(tiny_corpus, 2)
    for bf, b0, b1 in zip(iter(full), iter(h0), iter(h1)):
        # Lockstep shapes across hosts.
        assert b0["inputs"].shape == b1["inputs"].shape
        assert b0["labels"].shape == b1["labels"].shape
        glob = {k: np.concatenate([b0[k], b1[k]]) for k in b0}
        # Same utterances in the same order.
        np.testing.assert_array_equal(glob["input_lengths"],
                                      bf["input_lengths"])
        np.testing.assert_array_equal(glob["label_lengths"],
                                      bf["label_lengths"])
        u = min(glob["labels"].shape[1], bf["labels"].shape[1])
        np.testing.assert_array_equal(glob["labels"][:, :u],
                                      bf["labels"][:, :u])
        # Feature values agree on the common time extent (the sharded path
        # computes t_pad from manifest metadata, so it may pad further).
        t = min(glob["inputs"].shape[1], bf["inputs"].shape[1])
        np.testing.assert_allclose(glob["inputs"][:, :t], bf["inputs"][:, :t],
                                   rtol=1e-5, atol=1e-5)
        # Anything past the common extent is padding.
        assert np.all(glob["inputs"][:, t:] == 0)


def test_metadata_t_pad_covers_true_frames(tiny_corpus):
    """The metadata-estimated global t_pad must never clip real frames."""
    full, (h0, h1) = _loaders(tiny_corpus, 2)
    for b0, b1 in zip(iter(h0), iter(h1)):
        for b in (b0, b1):
            assert int(b["input_lengths"].max()) <= b["inputs"].shape[1]


def test_each_host_reads_only_its_shard(tiny_corpus, monkeypatch):
    preproc = Preprocessor(tiny_corpus["manifest"], start_and_end=False, seed=0)

    seen: dict[int, list[str]] = {0: [], 1: []}
    orig = Preprocessor.preprocess

    def make_spy(host):
        def spy(self, wave_file, text):
            seen[host].append(wave_file)
            return orig(self, wave_file, text)
        return spy

    batches_per_host = {}
    for host in range(2):
        ldr = make_loader(tiny_corpus["manifest"], preproc, 4, seed=3,
                          num_workers=1, process_shard=(host, 2))
        # native=False so every featurization goes through the spied method.
        ldr.native = False
        monkeypatch.setattr(Preprocessor, "preprocess", make_spy(host))
        batches_per_host[host] = list(ldr)
        monkeypatch.setattr(Preprocessor, "preprocess", orig)

    s0, s1 = set(seen[0]), set(seen[1])
    assert s0 and s1
    assert s0.isdisjoint(s1)
    # Together they cover exactly the utterances of the full batches.
    n_total = sum(b["inputs"].shape[0]
                  for bs in batches_per_host.values() for b in bs)
    assert len(seen[0]) + len(seen[1]) == n_total


def test_batch_size_must_divide(tiny_corpus):
    preproc = Preprocessor(tiny_corpus["manifest"], start_and_end=False, seed=0)
    with pytest.raises(ValueError, match="not divisible"):
        make_loader(tiny_corpus["manifest"], preproc, 5, process_shard=(0, 2))


# shard_batch's multi-process branch (make_array_from_process_local_data) is
# exercised for real by tests/multiprocess_test.py's 2-process workers.
