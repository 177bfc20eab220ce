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

__all__ = ["MemoryMonitor", "device_memory_stats", "log_live_arrays"]


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
        cur = device_memory_stats().get("bytes_in_use", 0) / 1024 ** 3
        logger.info("memory%s: peak RSS %.2f GB, device cur %.2f GB "
                    "peak %.2f GB",
                    f" [{tag}]" if tag else "", self.peak_rss_gb, cur,
                    self.peak_device_gb)


def log_live_arrays(tag: str = "", top: int = 8) -> None:
    """Aggregate jax.live_arrays() by (shape, dtype) — the leak finder.
    Logs the `top` heaviest groups and the total device-resident bytes."""
    groups: Dict[tuple, list] = {}
    total = 0
    for a in jax.live_arrays():
        try:
            nb = a.nbytes
        except Exception:
            continue
        total += nb
        key = (tuple(a.shape), str(a.dtype))
        g = groups.setdefault(key, [0, 0])
        g[0] += 1
        g[1] += nb
    rows = sorted(groups.items(), key=lambda kv: -kv[1][1])[:top]
    desc = ", ".join(f"{n}x{s}:{d}={b/1024**2:.0f}MB"
                     for (s, d), (n, b) in rows)
    logger.info("live arrays%s: total %.2f GB | %s",
                f" [{tag}]" if tag else "", total / 1024 ** 3, desc)
