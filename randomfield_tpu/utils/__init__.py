"""Small utilities: timing, device info."""

from randomfield_tpu.utils.timing import Timer, block_and_time

__all__ = ["Timer", "block_and_time"]
