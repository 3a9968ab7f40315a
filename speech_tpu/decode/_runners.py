"""Shared LRU cache for hoisted beam-search programs.

Both beam modules cache one jitted encode+search program per (model,
config); jax.jit's own cache then keys on bucket shapes, so a second
same-shape batch spends zero trace/compile time (the make_infer_step
discipline). Keys use id(model) with the model kept in the value so a live
model can never collide with a recycled id, and the cache is LRU-bounded so
a process sweeping many checkpoints doesn't pin every model + its compiled
executables forever.
"""

from __future__ import annotations

from typing import Any, Callable

_MAX_ENTRIES = 8


class RunnerCache:
    def __init__(self, max_entries: int = _MAX_ENTRIES):
        self._entries: dict = {}
        self._max = max_entries

    def get(self, model: Any, cfg: tuple, build: Callable[[], Callable]
            ) -> Callable:
        """Return the cached runner for (model, cfg), building on miss."""
        key = (id(model),) + cfg
        entry = self._entries.pop(key, None)
        if entry is not None and entry[0] is model:
            self._entries[key] = entry  # re-insert = most-recently-used
            return entry[1]
        run = build()
        self._entries[key] = (model, run)
        while len(self._entries) > self._max:
            self._entries.pop(next(iter(self._entries)))  # evict LRU
        return run
