"""Build the native extensions in-place:  python speech_tpu/native/setup.py build_ext --inplace

Invoked by the top-level Makefile. Output lands next to this file so
speech_tpu.utils.editdistance can import it as speech_tpu.native._editdistance.
"""

import os

from setuptools import Extension, setup

here = os.path.dirname(os.path.abspath(__file__))

setup(
    name="speech_tpu_native",
    ext_modules=[
        Extension(
            "_editdistance",
            sources=[os.path.join(here, "editdistance.c")],
            extra_compile_args=["-O3"],
        ),
        # Plain C-ABI shared library (consumed via ctypes, not imported as a
        # Python module): wav decode + log-spectrogram featurization with an
        # internal thread pool. See featurizer.cc.
        Extension(
            "_featurizer",
            sources=[os.path.join(here, "featurizer.cc")],
            language="c++",
            extra_compile_args=["-O3", "-std=c++17", "-pthread"],
            extra_link_args=["-pthread"],
        ),
        # FLAC decoder (C-ABI via ctypes, see flacdec.py): reads LibriSpeech
        # in place with no external conversion tools.
        Extension(
            "_flacdec",
            sources=[os.path.join(here, "flacdec.cc")],
            language="c++",
            extra_compile_args=["-O3", "-std=c++17"],
        ),
    ],
    script_args=["build_ext", "--inplace", f"--build-lib={here}", f"--build-temp={os.path.join(here, 'build')}"],
)
