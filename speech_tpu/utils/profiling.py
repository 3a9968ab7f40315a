"""Profiling: XLA device traces + step-time statistics.

The reference's only tracing is a manual model-vs-data wall-clock split shown
in the tqdm postfix (reference train.py:23, 27, 36-39, 44-46; SURVEY §5.1).
Here that split is kept (trainer.run_epoch returns it and logs it), and two
TPU-native tools are added:

  * :class:`TraceWindow` — captures a ``jax.profiler`` device trace for a
    step window inside the training loop (config ``profile`` section:
    ``{"start_step": N, "num_steps": M, "dir": ...}``). The dump is the
    standard XPlane/trace-viewer format readable by TensorBoard's profile
    plugin or perfetto.
  * :func:`summarize_trace` — host-side reduction of a captured trace into
    per-op-class device time (convolutions, scans/whiles, fusions, pallas
    custom calls), the same decomposition used to optimize the encoder.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Optional


class TraceWindow:
    """Start/stop a jax.profiler trace around a step window.

    Call ``maybe_start(step)`` / ``maybe_stop(step)`` each iteration; the
    trace covers steps [start_step, start_step + num_steps).
    """

    def __init__(self, trace_dir: str, start_step: int, num_steps: int):
        self.trace_dir = trace_dir
        self.start_step = int(start_step)
        self.end_step = int(start_step) + int(num_steps)
        self._active = False
        self.done = False

    def maybe_start(self, step: int) -> None:
        if not self.done and not self._active and step >= self.start_step:
            import jax

            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.end_step:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self.done = True

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self.done = True


def _iter_trace_events(trace_dir: str):
    for path in glob.glob(os.path.join(
            trace_dir, "plugins", "profile", "*", "*.trace.json.gz")):
        with gzip.open(path) as f:
            data = json.load(f)
        yield from data.get("traceEvents", [])


def summarize_trace(trace_dir: str, top: int = 15) -> dict:
    """Reduce a captured trace to device-time by op class + top ops.

    Returns {"classes": {name: total_us}, "top_ops": [(name, total_us)]}.
    Device lanes are identified by process_name metadata containing "TPU"
    or "/device:".
    """
    events = list(_iter_trace_events(trace_dir))
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name:
                device_pids.add(e["pid"])
    classes: collections.Counter = collections.Counter()
    per_op: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name, dur = e.get("name", ""), e.get("dur", 0)
        if name.startswith("jit_") or name.isdigit():
            continue  # program-level markers, double-counts
        per_op[name] += dur
        if name.startswith("while"):
            classes["scan/while"] += dur
        elif "custom" in name.lower():
            classes["pallas/custom_call"] += dur
        elif "conv" in name.lower():
            classes["convolution"] += dur
        elif "fusion" in name:
            classes["fusion"] += dur
        elif "copy" in name:
            classes["copy"] += dur
        else:
            classes["other"] += dur
    return {"classes": dict(classes), "top_ops": per_op.most_common(top)}


def make_trace_window(profile_cfg: Optional[dict], save_path: str
                      ) -> Optional[TraceWindow]:
    """Build a TraceWindow from the config ``profile`` section (or None)."""
    if not profile_cfg:
        return None
    trace_dir = profile_cfg.get("dir") or os.path.join(save_path, "trace")
    return TraceWindow(trace_dir,
                       start_step=profile_cfg.get("start_step", 5),
                       num_steps=profile_cfg.get("num_steps", 5))
