"""Logger (role of reference ``auto_round/logger.py``): std logging with a
TRACE level, warning_once, and env-var level control (AR_LOG_LEVEL)."""

from __future__ import annotations

import logging
import os

TRACE = 5
logging.addLevelName(TRACE, "TRACE")

logger = logging.getLogger("autoround_tpu")

_seen_warnings = set()


def warning_once(msg: str) -> None:
    if msg not in _seen_warnings:
        _seen_warnings.add(msg)
        logger.warning(msg)


def trace(msg: str, *args) -> None:
    logger.log(TRACE, msg, *args)


def _setup() -> None:
    if logger.handlers:
        return
    handler = logging.StreamHandler()
    handler.setFormatter(logging.Formatter(
        "%(asctime)s [%(levelname)s] autoround_tpu: %(message)s", "%H:%M:%S"))
    logger.addHandler(handler)
    level = os.environ.get("AR_LOG_LEVEL", "INFO").upper()
    logger.setLevel(TRACE if level == "TRACE" else getattr(logging, level, logging.INFO))


_setup()
