"""Memory observability.

Role of the reference's ``MemoryMonitor`` (``utils/device.py:1306-1441``
peak CPU/VRAM tracker, ``log_summary`` after every block): tracks peak
host RSS and JAX device memory, logged per block.
"""

from __future__ import annotations

import resource
from typing import Dict, Optional

import jax

from .logger import logger

__all__ = ["MemoryMonitor", "device_memory_stats"]


def device_memory_stats(device=None) -> Dict[str, int]:
    """bytes_in_use / peak_bytes_in_use when the backend exposes them."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    return {k: stats.get(k, 0)
            for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")}


class MemoryMonitor:
    def __init__(self):
        self.peak_rss_gb = 0.0
        self.peak_device_gb = 0.0
        self.update()

    def update(self) -> None:
        rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        self.peak_rss_gb = max(self.peak_rss_gb, rss_kb / 1024 / 1024)
        dev = device_memory_stats()
        self.peak_device_gb = max(self.peak_device_gb,
                                  dev.get("peak_bytes_in_use", 0) / 1024 ** 3)

    def log_summary(self, tag: str = "") -> None:
        self.update()
        logger.info("memory%s: peak RSS %.2f GB, peak device %.2f GB",
                    f" [{tag}]" if tag else "", self.peak_rss_gb,
                    self.peak_device_gb)
