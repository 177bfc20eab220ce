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
    import os
    if os.environ.get("AR_LEAK_PROBE") == "1":
        _leak_probe(tag)


_SEEN_IDS: set = set()


def _leak_probe(tag: str, min_mb: float = 16.0) -> None:
    """For arrays alive across TWO log calls (long-lived), print who
    refers to them (gc.get_referrers, 2 levels) — the leak finder's
    second stage."""
    import gc
    global _SEEN_IDS
    now = {}
    for a in jax.live_arrays():
        if getattr(a, "nbytes", 0) >= min_mb * 1024 ** 2:
            now[id(a)] = a
    old = [a for i, a in now.items() if i in _SEEN_IDS]
    _SEEN_IDS = set(now)
    # sample up to 3 survivors of distinct shapes
    seen_shapes = set()
    probes = []
    for a in old:
        if a.shape not in seen_shapes:
            seen_shapes.add(a.shape)
            probes.append(a)
        if len(probes) == 3:
            break
    for a in probes:
        refs = [r for r in gc.get_referrers(a)
                if r is not now and r is not old and r is not probes]
        lines = []
        for r in refs[:6]:
            if isinstance(r, dict):
                keys = [k for k, v in r.items() if v is a]
                lines.append(f"dict(keys={keys[:3]})")
                for rr in gc.get_referrers(r)[:3]:
                    lines.append(f"  <- {type(rr).__name__}"
                                 + (f" {getattr(rr, '__name__', '')}"
                                    if callable(rr) else ""))
            elif isinstance(r, list):
                lines.append(f"list(len={len(r)})")
                for rr in gc.get_referrers(r)[:3]:
                    lines.append(f"  <- {type(rr).__name__}")
            else:
                lines.append(type(r).__name__)
        logger.info("leak probe [%s] %s %s: %s", tag, a.shape, a.dtype,
                    " | ".join(lines))
