"""Bulk dataset conversion helpers (reference speech/utils/data_helpers.py:11-17)."""

from __future__ import annotations

import glob
import os

import tqdm

from speech_tpu.utils import convert


def convert_full_set(path: str, pattern: str, new_ext: str = "wav",
                     **kwargs) -> None:
    """Convert every file matching ``path/pattern`` to wav alongside it."""
    audio_files = glob.glob(os.path.join(path, pattern))
    for af in tqdm.tqdm(audio_files):
        base, _ = os.path.splitext(af)
        convert.to_wave(af, base + os.path.extsep + new_ext, **kwargs)
