"""Decoding: batched on-device greedy and beam search for all model families."""

from speech_tpu.decode.ctc_greedy import ctc_greedy_decode, max_decode

__all__ = ["ctc_greedy_decode", "max_decode"]
