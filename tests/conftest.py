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

# Persistent compile cache: the suite is compile-dominated on CPU, and the
# programs are identical across runs — cache them once ever.
_cache_dir = os.environ.get(
    "SPEECH_TPU_TEST_CACHE",
    os.path.expanduser("~/.cache/speech_tpu/test_xla_cache"))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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


# Heavy tests (>10 s each on this 2-CPU box, measured with --durations) are
# auto-marked slow here — one maintenance point instead of decorators spread
# over 20 files. Every subsystem keeps at least one fast test in the quick
# suite; the full sweep runs with --runslow / RUN_SLOW=1.
_HEAVY_TESTS = {
    "test_dryrun_multichip_contract",
    "test_pallas_grad_matches_pure",
    "test_pallas_weighted_cotangent",
    "test_bf16_loss_close_to_f32",
    "test_bf16_gradients_finite_and_f32",
    "test_beam_improves_on_greedy_score",
    "test_tp_train_step_matches_replicated",
    "test_distributed_eval_matches_serial",
    "test_loss_and_grads",
    "test_parallel_step_seq2seq_transducer",
    "test_parallel_step_matches_single_device",
    "test_parallel_multiple_steps_converge",
    "test_ctc_loss_runs_and_is_finite",
    "test_ctc_bidirectional_and_dropout",
    "test_rnnt_grad_finite_difference",
    "test_beam1_matches_greedy",
    "test_encoder_seq_sharded_matches_unsharded",
    "test_bigru_seq_sharded_per_utterance_lengths",
    "test_make_seq_infer_step_matches_log_probs",
    "test_bigru_seq_sharded_matches_encoder_layer",
    "test_full_vjp_matches_scan",
    "test_streaming_transducer_matches_offline_greedy",
    "test_streaming_encoder_matches_offline",
    "test_padding_does_not_affect_valid_outputs",
}


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        name = getattr(item, "originalname", None) or item.name
        if "slow" in item.keywords or name in _HEAVY_TESTS:
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
