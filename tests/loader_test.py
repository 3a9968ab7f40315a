"""Data pipeline tests (capability parity with reference tests/loader_test.py:5-36
plus the TPU-specific static-shape guarantees)."""

import numpy as np
import pytest

from speech_tpu.data import features as F
from speech_tpu.data.loader import AudioDataset, make_loader
from speech_tpu.data.preprocessor import Preprocessor


def test_preprocessor_vocab(tiny_corpus):
    preproc = Preprocessor(tiny_corpus["manifest"], max_samples=10)
    # chars are a,b,c,space (+ start/end)
    assert preproc.vocab_size == 6
    # START must be the last index (reference loader.py:39-43).
    assert preproc.int_to_char[preproc.vocab_size - 1] == Preprocessor.START
    assert preproc.int_to_char[preproc.vocab_size - 2] == Preprocessor.END
    ids = preproc.encode("abc")
    assert preproc.decode(ids) == ["a", "b", "c"]
    # deterministic across refits
    p2 = Preprocessor(tiny_corpus["manifest"], max_samples=10)
    assert p2.tokens == preproc.tokens


def test_preprocessor_no_start_end(tiny_corpus):
    preproc = Preprocessor(tiny_corpus["manifest"], start_and_end=False)
    assert preproc.vocab_size == 4
    ids = preproc.encode("ab")
    assert len(ids) == 2
    assert preproc.decode(ids) == ["a", "b"]


def test_preprocessor_features(tiny_corpus):
    preproc = Preprocessor(tiny_corpus["manifest"])
    row = tiny_corpus["rows"][0]
    feats, targets = preproc.preprocess(row["audio"], row["text"])
    assert feats.dtype == np.float32
    assert feats.shape[1] == preproc.input_dim == F.feature_dim(16000)
    # normalized features should be roughly standardized
    assert abs(float(feats.mean())) < 1.0


def test_preprocessor_save_restore(tiny_corpus, tmp_path):
    preproc = Preprocessor(tiny_corpus["manifest"])
    preproc.save(str(tmp_path))
    back = Preprocessor.restore(str(tmp_path))
    assert back.tokens == preproc.tokens
    assert back.start_and_end == preproc.start_and_end
    np.testing.assert_array_equal(back.mean, preproc.mean)
    np.testing.assert_array_equal(back.std, preproc.std)
    row = tiny_corpus["rows"][1]
    a, ta = preproc.preprocess(row["audio"], row["text"])
    b, tb = back.preprocess(row["audio"], row["text"])
    np.testing.assert_array_equal(a, b)
    assert ta == tb


def test_dataset_sorted(tiny_corpus):
    preproc = Preprocessor(tiny_corpus["manifest"])
    dataset = AudioDataset(tiny_corpus["manifest"], preproc, batch_size=2)
    assert len(dataset) == 6


def test_loader_batches(tiny_corpus):
    preproc = Preprocessor(tiny_corpus["manifest"])
    loader = make_loader(tiny_corpus["manifest"], preproc, batch_size=2,
                         num_workers=2, time_mult=10, label_mult=4, seed=0)
    assert len(loader) == 3
    seen = 0
    for batch in loader:
        b, t, f = batch["inputs"].shape
        assert b == 2
        assert f == preproc.input_dim
        assert t % 10 == 0
        assert batch["labels"].shape[0] == 2
        assert batch["labels"].shape[1] % 4 == 0
        assert batch["inputs"].dtype == np.float32
        assert batch["labels"].dtype == np.int32
        # true lengths are bounded by the padded shapes and positive
        assert (batch["input_lengths"] <= t).all()
        assert (batch["input_lengths"] > 0).all()
        assert (batch["label_lengths"] <= batch["labels"].shape[1]).all()
        # padding beyond each true length is zero
        i0 = int(batch["input_lengths"][0])
        assert np.all(batch["inputs"][0, i0:] == 0)
        seen += 1
    assert seen == 3


def test_loader_epoch_shuffle_deterministic(tiny_corpus):
    preproc = Preprocessor(tiny_corpus["manifest"])
    l1 = make_loader(tiny_corpus["manifest"], preproc, batch_size=2, seed=7)
    l2 = make_loader(tiny_corpus["manifest"], preproc, batch_size=2, seed=7)
    b1 = [b["input_lengths"].tolist() for b in l1]
    b2 = [b["input_lengths"].tolist() for b in l2]
    assert b1 == b2
    # next epoch differs in order but same multiset
    b1e2 = [b["input_lengths"].tolist() for b in l1]
    assert sorted(map(tuple, b1e2)) == sorted(map(tuple, b1))


def test_pad_last_rejects_process_sharding(tiny_corpus):
    """pad_last's _n_valid is a global count; combining it with per-host row
    slices would mis-slice silently — the loader refuses (ADVICE r3)."""
    preproc = Preprocessor(tiny_corpus["manifest"])
    with pytest.raises(ValueError, match="pad_last"):
        make_loader(tiny_corpus["manifest"], preproc, batch_size=4,
                    drop_last=False, pad_last=True, process_shard=(0, 2),
                    num_workers=1)


def test_raw_path_rejects_forced_tpad_underestimate(tiny_corpus):
    """The raw-waveform path fails loudly when a forced t_pad underestimates
    the true frame count, mirroring the featurized collate (ADVICE r3)."""
    preproc = Preprocessor(tiny_corpus["manifest"])
    loader = make_loader(tiny_corpus["manifest"], preproc, batch_size=2,
                         raw_audio=True, num_workers=1)
    with pytest.raises(ValueError, match="exceeds the forced t_pad"):
        loader._make_batch_raw([0, 1], t_pad=1)


def test_loader_pad_last_one_shape(tiny_corpus):
    """pad_last: the ragged final batch is padded to batch_size by repeating
    rows and tagged with _n_valid, so eval compiles ONE program per bucket."""
    preproc = Preprocessor(tiny_corpus["manifest"])
    loader = make_loader(tiny_corpus["manifest"], preproc, batch_size=4,
                         drop_last=False, pad_last=True, num_workers=1)
    batches = list(loader)
    assert len(batches) == 2  # 6 utts -> 4 + ragged 2 padded to 4
    for batch in batches:
        assert batch["inputs"].shape[0] == 4
    tail = batches[-1]
    assert tail["_n_valid"] == 2
    # padded rows replicate the last valid example
    np.testing.assert_array_equal(tail["inputs"][1], tail["inputs"][2])
    np.testing.assert_array_equal(tail["labels"][1], tail["labels"][3])
    assert batches[0].get("_n_valid", 4) == 4
