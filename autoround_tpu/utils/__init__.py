"""Infra utilities (role of reference ``auto_round/utils/``)."""

from .logger import logger, trace, warning_once

__all__ = ["logger", "warning_once", "trace"]
