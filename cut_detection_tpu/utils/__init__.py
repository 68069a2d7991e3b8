"""Shared utilities: logging setup, throughput metering, profiling hooks."""

from cut_detection_tpu.utils.logging import setup_logging
from cut_detection_tpu.utils.profiling import ThroughputMeter, maybe_trace

__all__ = ["setup_logging", "ThroughputMeter", "maybe_trace"]
