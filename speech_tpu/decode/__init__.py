"""Decoding: batched on-device greedy and beam search for all model families,
plus streaming (chunked, stateful) inference for serving."""

from speech_tpu.decode.ctc_greedy import ctc_greedy_decode, max_decode
from speech_tpu.decode.streaming import (
    StreamingCTC,
    StreamingEncoder,
    StreamingFeaturizer,
    StreamingTransducer,
)

__all__ = ["ctc_greedy_decode", "max_decode", "StreamingCTC",
           "StreamingEncoder", "StreamingFeaturizer", "StreamingTransducer"]
