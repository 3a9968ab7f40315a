"""Real 2-process jax.distributed coverage (SURVEY §7 hard part 6).

Spawns two subprocess workers that initialize a shared JAX distributed
runtime over CPU (4 virtual devices each, 8 global) and drive the multihost
branches end to end: per-host sharded loading, shard_batch's
make_array_from_process_local_data assembly, a data-parallel train step on
the global mesh, and _global_sum's cross-process allgather. See
tests/_mp_worker.py for the worker body.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mp_corpus(tmp_path_factory):
    """8 utterances so one global batch of 8 splits 4+4 over two hosts."""
    from speech_tpu.utils import wave as stw

    root = tmp_path_factory.mktemp("mp_corpus")
    rng = np.random.default_rng(11)
    rows = []
    texts = ["ab", "ba", "aab", "bba", "ab a", "b aa", "aa b", "bb a"]
    for i, text in enumerate(texts):
        n = int(16000 * (0.3 + 0.05 * i))
        path = str(root / f"u{i}.wav")
        stw.write_wave(path, (rng.standard_normal(n) * 3000).astype(np.int16),
                       16000)
        rows.append({"text": text, "duration": n / 16000, "audio": path})
    manifest = str(root / "data.json")
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return manifest


@pytest.mark.slow
def test_two_process_distributed(mp_corpus, tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    save_dir = str(tmp_path / "ckpt")  # shared fs for the single-writer check
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), mp_corpus, save_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out
    # both processes computed the SAME global loss (lockstep input sharding)
    losses = sorted(line.split("loss=")[1]
                    for out in outs for line in out.splitlines()
                    if "WORKER_OK" in line)
    assert losses[0] == losses[1], losses
