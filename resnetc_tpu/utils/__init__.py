"""Utilities: FLOP accounting, profiling, structured metrics logging."""

from resnetc_tpu.utils.flops import model_flops  # noqa: F401
