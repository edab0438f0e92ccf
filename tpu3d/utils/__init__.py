"""Utilities: synchronized timing, profiling helpers."""

from tpu3d.utils.timing import StageTimer, device_timeit, roundtrip_ms

__all__ = ["StageTimer", "device_timeit", "roundtrip_ms"]
