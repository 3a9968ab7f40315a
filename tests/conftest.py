"""Test configuration: force CPU JAX with 8 virtual devices (multi-chip
sharding tests run on a simulated mesh, per SURVEY.md §4), and provide tiny
generated audio corpora as fixtures (the reference checks binary wavs into the
repo; we synthesize them)."""

import os

# 8 virtual CPU devices for simulated-mesh sharding tests. XLA_FLAGS is read
# lazily when the CPU client is created, so setting it here works even though
# the environment's sitecustomize imports jax at interpreter startup; the
# platform override must instead go through jax.config (the env var was
# already consumed).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# Default: simulated 8-device CPU mesh. SPEECH_TPU_TEST_TPU=1 keeps the real
# TPU platform so the @pytest.mark.tpu compiled-kernel suite
# (tests/tpu_compiled_test.py) runs against the chip.
if not os.environ.get("SPEECH_TPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import json
import random

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (exhaustive parity "
                          "sweeps, full config training loops)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: exhaustive/integration test excluded from the "
        "default quick suite (enable with --runslow or RUN_SLOW=1)")
    config.addinivalue_line(
        "markers", "tpu: needs a real TPU; skipped on other platforms")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def pytest_runtest_setup(item):
    if "tpu" in item.keywords and jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU (run with SPEECH_TPU_TEST_TPU=1)")


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """A small synthetic corpus: wavs + JSONL manifest.

    Mirrors the shape of the reference's tests/test.json fixture (8 rows over
    2 wavs, loader_test.py) but generated: 6 utterances, 16 kHz noise-ish
    audio, char transcripts over a small alphabet.
    """
    root = tmp_path_factory.mktemp("corpus")
    from speech_tpu.utils import wave as stw

    rng = np.random.default_rng(1337)
    pyrng = random.Random(1337)
    sr = 16000
    rows = []
    texts = ["abc ab", "cab abc", "aa bb cc", "b", "cccab ba", "abcabc a"]
    for i, text in enumerate(texts):
        dur = 0.3 + 0.1 * i
        n = int(sr * dur)
        # Band-limited noise so spectrogram stats are non-degenerate.
        audio = (rng.standard_normal(n) * 3000).astype(np.int16)
        path = str(root / f"utt{i}.wav")
        stw.write_wave(path, audio, sr)
        rows.append({"text": text, "duration": n / sr, "audio": path})
    pyrng.shuffle(rows)
    manifest = str(root / "data.json")
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return {"manifest": manifest, "root": str(root), "sample_rate": sr,
            "rows": rows}
