"""Worker for the 2-process jax.distributed CPU test (multiprocess_test.py).

Each process gets 4 virtual CPU devices (8 global). Exercises the REAL
multihost branches that single-process tests cannot reach:
  * parallel.mesh.shard_batch -> jax.make_array_from_process_local_data
  * parallel.eval._global_sum  -> multihost process_allgather
  * one data-parallel training step over the global mesh

Usage: python tests/_mp_worker.py <coordinator_port> <process_id> <manifest>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    port, pid, manifest = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from speech_tpu.data.loader import make_loader
    from speech_tpu.data.preprocessor import Preprocessor
    from speech_tpu.models import build_model
    from speech_tpu.parallel import (make_mesh, make_parallel_train_step,
                                     shard_batch)
    from speech_tpu.parallel.eval import _global_sum
    from speech_tpu.training.trainer import init_params, make_optimizer

    # --- _global_sum across processes ---
    sums = _global_sum(np.array([1 + pid, 10.0], np.float64))
    np.testing.assert_allclose(sums, [3.0, 20.0])

    # --- per-host sharded loader -> global array assembly -> train step ---
    preproc = Preprocessor(manifest, start_and_end=False, seed=0)
    ldr = make_loader(manifest, preproc, 8, process_shard=(pid, 2), seed=0,
                      num_workers=1)
    mesh = make_mesh(n_data=8, n_model=1)

    cfg = {"class": "CTC", "dropout": 0.0,
           "encoder": {"conv": [[4, 5, 31, 2]],
                       "rnn": {"dim": 8, "layers": 1, "bidirectional": False}}}
    model = build_model(cfg, preproc)
    tx = make_optimizer({"learning_rate": 0.01})
    params = init_params(model, preproc.input_dim, jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    step = make_parallel_train_step(model, tx, mesh)

    batch = next(iter(ldr))
    assert batch["inputs"].shape[0] == 4, batch["inputs"].shape  # local rows
    sharded = shard_batch(batch, mesh)  # multihost branch
    assert sharded["inputs"].shape[0] == 8  # global batch re-assembled
    params, opt_state, loss, gn = step(params, opt_state, sharded,
                                       jax.random.PRNGKey(1))
    loss = float(loss)
    assert np.isfinite(loss), loss

    # --- single-writer checkpoint epoch (trainer.save_checkpoint_synced) ---
    from speech_tpu.training import checkpoint as ckpt_mod
    from speech_tpu.training.trainer import save_checkpoint_synced

    save_dir = sys.argv[4]
    writes = []
    orig_save = ckpt_mod.save_train_state
    ckpt_mod.save_train_state = (
        lambda *a, **kw: (writes.append(1), orig_save(*a, **kw))[1])
    cfg_full = {"model": cfg, "data": {}, "optimizer": {}}
    save_checkpoint_synced(save_dir, params, opt_state, preproc, cfg_full,
                           step=1, epoch=0, best_so_far=1.0, is_best=True)
    ckpt_mod.save_train_state = orig_save
    # exactly ONE writer across the job: process 0 wrote, process 1 did not
    assert len(writes) == (1 if pid == 0 else 0), (pid, writes)
    # the barrier ordered the write before anyone proceeds: every process can
    # now read the checkpoint process 0 wrote
    assert ckpt_mod.has_train_state(save_dir), save_dir
    restored, _, state = ckpt_mod.restore_train_state(save_dir, opt_state)
    assert state["step"] == 1 and state["epoch"] == 0, state

    print(f"WORKER_OK {pid} loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    main()
