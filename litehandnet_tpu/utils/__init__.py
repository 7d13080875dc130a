"""Utilities: logging, seeding, profiling."""

from litehandnet_tpu.utils.logging_ import MetricLogger  # noqa: F401
