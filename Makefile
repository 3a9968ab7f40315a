# Build native host-side components and run the test suite.
#
# The reference's Makefile clones and builds external C/CUDA loss libraries
# (reference Makefile:4-12); here the TPU compute path is Pallas, and the
# native host components are the C edit-distance extension used by eval
# scoring and the C++ data-pipeline featurizer (wav decode + STFT + normalize
# with an internal thread pool, speech_tpu/native/featurizer.cc).

.PHONY: all native test clean

all: native

native:
	python speech_tpu/native/setup.py

test: native
	python -m pytest tests/ -x -q

clean:
	rm -rf speech_tpu/native/build speech_tpu/native/*.so
