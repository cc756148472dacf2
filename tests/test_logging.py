"""Logging parity (reference movie_pipeline/logger.py): module loggers,
env-configured level, library-friendly idempotence."""

from __future__ import annotations

import logging

from big_data_imdb_classifier_spark import logger as L


def test_get_logger_emits_at_configured_level(caplog):
    lg = L.get_logger("big_data_imdb_classifier_spark.test_module")
    with caplog.at_level(logging.INFO,
                         logger="big_data_imdb_classifier_spark.test_module"):
        lg.info("hello %s", "world")
        lg.debug("invisible at INFO")
    infos = [r for r in caplog.records if r.levelno == logging.INFO]
    assert any(r.getMessage() == "hello world" for r in infos)
    assert not any("invisible" in r.getMessage() for r in caplog.records
                   if r.levelno == logging.DEBUG and
                   logging.getLogger(r.name).getEffectiveLevel() > logging.DEBUG)
    assert lg.name == "big_data_imdb_classifier_spark.test_module"


def test_level_comes_from_env(monkeypatch):
    monkeypatch.setenv(L._ENV_LEVEL, "WARNING")
    L.configure(force=True)
    try:
        assert logging.getLogger().level == logging.WARNING
        monkeypatch.setenv(L._ENV_LEVEL, "DEBUG")
        L.configure(force=True)
        assert logging.getLogger().level == logging.DEBUG
    finally:
        monkeypatch.delenv(L._ENV_LEVEL)
        L.configure(force=True)


def test_configure_is_idempotent_and_library_safe():
    """A second non-forced configure adds no duplicate handlers, and an
    application that already installed handlers is left untouched."""
    L.configure(force=True)
    n = len(logging.getLogger().handlers)
    L.configure()
    L.configure()
    assert len(logging.getLogger().handlers) == n


def test_no_print_left_in_library_code():
    """The reference logs through stdlib logging everywhere; grep-level
    guarantee that no print() call survives in non-test library code."""
    import pathlib
    import re

    pkg = pathlib.Path(L.__file__).parent
    offenders = []
    for py in pkg.rglob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            stripped = line.strip()
            if stripped.startswith("#"):
                continue
            if re.search(r"(?<![\w.])print\(", stripped):
                offenders.append(f"{py.relative_to(pkg)}:{i}")
    # cli.py's `list` subcommand prints its stdout contract (query
    # names) — that's command output, not logging
    offenders = [o for o in offenders if not o.startswith("cli.py")]
    assert offenders == [], offenders
