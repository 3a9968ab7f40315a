"""Data pipeline: manifests, featurization, preprocessing, bucketed loading."""

from speech_tpu.data.manifest import read_data_json
from speech_tpu.data.preprocessor import Preprocessor
from speech_tpu.data.loader import AudioDataset, make_loader

__all__ = ["read_data_json", "Preprocessor", "AudioDataset", "make_loader"]
