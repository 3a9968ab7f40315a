"""On-device featurization frontend: parity with the host pipeline, mel
filterbank correctness, end-to-end config training with
``data.on_device_features`` (VERDICT r1 item 4; BASELINE north star
"featurization runs on-device inside the jitted step")."""

import json

import numpy as np
import pytest

from speech_tpu.data import features as F
from speech_tpu.data.frontend import OnDeviceFrontend, samples_for_frames
from speech_tpu.data.loader import make_loader
from speech_tpu.data.preprocessor import Preprocessor


def test_mel_filterbank_shape_and_coverage():
    fb = F.mel_filterbank(16000, 40)
    assert fb.shape == (161, 40)
    assert np.all(fb >= 0)
    # Every mel filter has support; interior bins are covered by >= 1 filter.
    assert np.all(fb.sum(axis=0) > 0)
    covered = fb.sum(axis=1)
    assert np.all(covered[3:-3] > 0)


def test_log_mel_np_matches_batch_device():
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 1000).astype(np.int16)
    host = F.log_mel_np(audio, 16000, n_mels=40)
    s_pad = samples_for_frames(host.shape[0], 16000)
    dev = np.asarray(F.log_mel_batch(
        audio[None, :s_pad].astype(np.float32), 16000, 40))[0]
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)


def test_frontend_matches_host_features(tiny_corpus):
    preproc = Preprocessor(tiny_corpus["manifest"], start_and_end=False, seed=0)
    ldr_host = make_loader(tiny_corpus["manifest"], preproc, 3, seed=1,
                           num_workers=1, drop_last=False)
    ldr_raw = make_loader(tiny_corpus["manifest"], preproc, 3, seed=1,
                          num_workers=1, drop_last=False, raw_audio=True)
    fe = OnDeviceFrontend(preproc, tiny_corpus["sample_rate"])
    for host_b, raw_b in zip(iter(ldr_host), iter(ldr_raw)):
        assert "waveforms" in raw_b and "inputs" not in raw_b
        np.testing.assert_array_equal(host_b["input_lengths"],
                                      raw_b["input_lengths"])
        out = fe(raw_b)
        feats = np.asarray(out["inputs"])
        t = min(feats.shape[1], host_b["inputs"].shape[1])
        # Compare only true frames (padding normalization differs: host pads
        # feature zeros, frontend normalizes log(eps) energy — both masked).
        for i in range(feats.shape[0]):
            n = int(raw_b["input_lengths"][i])
            np.testing.assert_allclose(feats[i, :n], host_b["inputs"][i, :n],
                                       rtol=1e-3, atol=1e-3)


def test_frontend_logmel_variant(tiny_corpus):
    preproc = Preprocessor(tiny_corpus["manifest"], start_and_end=False,
                           seed=0, feature_type="logmel", n_mels=24)
    assert preproc.input_dim == 24
    ldr = make_loader(tiny_corpus["manifest"], preproc, 3, seed=1,
                      num_workers=1, drop_last=False, raw_audio=True)
    fe = OnDeviceFrontend(preproc, tiny_corpus["sample_rate"])
    batch = next(iter(ldr))
    out = fe(batch)
    feats = np.asarray(out["inputs"])
    assert feats.shape[-1] == 24
    # Normalized true frames should be roughly zero-mean unit-variance.
    n = int(batch["input_lengths"][0])
    assert abs(float(feats[0, :n].mean())) < 2.0


def test_preproc_roundtrip_keeps_feature_cfg(tiny_corpus, tmp_path):
    preproc = Preprocessor(tiny_corpus["manifest"], start_and_end=False,
                           seed=0, feature_type="logmel", n_mels=24)
    preproc.save(str(tmp_path))
    back = Preprocessor.restore(str(tmp_path))
    assert back.feature_type == "logmel" and back.n_mels == 24
    assert back.input_dim == 24


@pytest.mark.slow
def test_on_device_features_config_trains(tiny_corpus, tmp_path):
    from speech_tpu.training import trainer

    config = {
        "seed": 1,
        "save_path": str(tmp_path / "model"),
        "compilation_cache": False,
        "data": {
            "train_set": tiny_corpus["manifest"],
            "dev_set": tiny_corpus["manifest"],
            "start_and_end": False,
            "on_device_features": True,
            "time_mult": 20,
            "label_mult": 8,
            "num_workers": 1,
        },
        "optimizer": {"batch_size": 3, "epochs": 2, "learning_rate": 0.01,
                      "momentum": 0.0},
        "model": {
            "class": "CTC",
            "dropout": 0.0,
            "encoder": {"conv": [[4, 3, 15, 2]],
                        "rnn": {"dim": 16, "layers": 1,
                                "bidirectional": False}},
        },
    }
    summary = trainer.run(config, verbose=False)
    assert np.isfinite(summary["avg_loss"])
    assert summary["epochs_run"] == 2
