"""Logging configuration — the operational-parity twin of the
reference's stdlib logging setup (reference movie_pipeline/logger.py:
1-43: a root basicConfig with an asctime/name/level format plus a
``get_logger(name)`` accessor, wired through every module).

Differences earned by the Spark context, not copied around:

* configuration is LAZY and idempotent (``get_logger`` configures on
  first use) instead of import-time ``basicConfig`` — a library must
  not clobber the logging config of an application that imports it,
  so an existing root handler is left untouched;
* the level comes from ``$SPARK_GRAFT_LOG_LEVEL`` (DEBUG/INFO/...),
  defaulting to INFO — the env knob the reference sets in code;
* driver-side only by design: executor-side Python (pandas UDFs,
  mapInPandas kernels) should stay log-free in hot paths; Spark's own
  log4j owns JVM/executor logging.
"""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
_ENV_LEVEL = "SPARK_GRAFT_LOG_LEVEL"
_configured = False


def configure(level: str | int | None = None, *, force: bool = False) -> None:
    """Install the engine's log format/level on the root logger.

    Idempotent; a no-op when the root logger already has handlers
    (the embedding application owns logging then) unless ``force``.
    """
    global _configured
    if _configured and not force:
        return
    root = logging.getLogger()
    if root.handlers and not force:
        _configured = True
        return
    if level is None:
        level = os.environ.get(_ENV_LEVEL, "INFO")
    if isinstance(level, str):
        level = getattr(logging, level.upper(), logging.INFO)
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT))
    if force:
        root.handlers.clear()
    root.addHandler(handler)
    root.setLevel(level)
    _configured = True


def get_logger(name: str) -> logging.Logger:
    """Named module logger, configuring the root on first use
    (reference logger.py get_logger contract)."""
    configure()
    return logging.getLogger(name)
