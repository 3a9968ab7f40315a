"""Training-throughput benchmark on the flagship CTC model (one chip).

Prints ONE JSON line:
  {"metric": "train_throughput", "value": N, "unit": "audio_s/s/chip",
   "vs_baseline": R}

Metric: seconds of audio processed per wall-clock second per chip while
running full jitted training steps (forward + CTC loss + backward + SGD
update) on the LibriSpeech-scale conv+BiGRU CTC model from
``__graft_entry__.FLAGSHIP_MODEL_CFG``. Utterance length ~10 s at a 10 ms
feature hop. The reference publishes no throughput numbers (BASELINE.md), so
vs_baseline is measured against this framework's round-1 recording
(BASELINE_AUDIO_S_PER_S below) — later rounds must push it up.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

from __graft_entry__ import FLAGSHIP_MODEL_CFG, _Spec, _fake_batch
from speech_tpu.models import build_model
from speech_tpu.training.trainer import make_optimizer, make_train_step

# Round-1 first recording on TPU v5e (this framework, f32). Update only with
# justification in BASELINE.md.
BASELINE_AUDIO_S_PER_S = 10350.0  # 2026-08-17, f32, B=16, T=1000

BATCH = 16
FRAMES = 1000  # 10 s utterances at 10 ms hop
LABELS = 160
HOP_S = 0.01
WARMUP = 3
STEPS = 50


def main():
    model = build_model(FLAGSHIP_MODEL_CFG, _Spec())
    tx = make_optimizer({"learning_rate": 0.001, "momentum": 0.9})
    rng = np.random.default_rng(0)
    batch = _fake_batch(rng, b=BATCH, t=FRAMES, u=LABELS, vocab=_Spec.vocab_size)

    params = model.init(jax.random.PRNGKey(0), batch["inputs"][:1],
                        batch["input_lengths"][:1])["params"]
    opt_state = tx.init(params)
    step = make_train_step(model, tx)

    # Device-resident inputs: the training loop double-buffers host->device
    # transfers behind compute (trainer.run_epoch prefetch), so steady-state
    # throughput is bounded by the compiled step, not by re-uploading the
    # same batch every iteration (which on a tunneled device dominates).
    batch = jax.device_put(batch)
    params = jax.device_put(params)
    opt_state = jax.device_put(opt_state)

    rng_key = jax.random.PRNGKey(1)
    for i in range(WARMUP):
        params, opt_state, loss, gn = step(params, opt_state, batch, rng_key)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(STEPS):
        params, opt_state, loss, gn = step(params, opt_state, batch, rng_key)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    audio_s = BATCH * FRAMES * HOP_S * STEPS
    value = audio_s / dt
    vs = value / BASELINE_AUDIO_S_PER_S if BASELINE_AUDIO_S_PER_S else 1.0
    print(json.dumps({
        "metric": "train_throughput",
        "value": round(value, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
