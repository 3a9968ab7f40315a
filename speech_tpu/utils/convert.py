"""Audio format conversion via ffmpeg/avconv.

Capability parity with the reference's ``speech/utils/convert.py``
(reference convert.py:10-44): ``to_wave`` shells out to whichever of
ffmpeg/avconv is installed. Unlike the reference (which raises at import
time, convert.py:33-35), detection is lazy so the package imports cleanly on
machines without either tool; the error surfaces only when conversion is
actually requested.
"""

from __future__ import annotations

import subprocess
from typing import Optional

FFMPEG = "ffmpeg"
AVCONV = "avconv"

_converter: Optional[str] = None
_checked = False


def _check_install(*args) -> bool:
    try:
        subprocess.check_output(args, stderr=subprocess.STDOUT)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def converter() -> str:
    """The available conversion program (ffmpeg preferred), or raises."""
    global _converter, _checked
    if not _checked:
        _checked = True
        if _check_install(FFMPEG, "-version"):
            _converter = FFMPEG
        elif _check_install(AVCONV, "-version"):
            _converter = AVCONV
    if _converter is None:
        raise OSError("Must have ffmpeg or avconv installed to convert audio")
    return _converter


def to_wave(audio_file: str, wave_file: str, use_avconv: Optional[bool] = None) -> None:
    """Convert an audio file to wav format (reference convert.py:38-44)."""
    if use_avconv is None:
        prog = converter()
    else:
        prog = AVCONV if use_avconv else FFMPEG
    args = [prog, "-y", "-i", audio_file, "-f", "wav", wave_file]
    subprocess.check_output(args, stderr=subprocess.STDOUT)
