"""Generic query CLI: registry listing + error paths (the `run` execution
path is exercised end-to-end by bench.py and the driver contract; spinning
a second JVM here would only re-test get_spark)."""

from __future__ import annotations

import pytest

from big_data_imdb_classifier_spark.cli import main


def test_list_filters_by_prefix(capsys):
    from big_data_imdb_classifier_spark import plans

    plans.load_all()
    n_tpch = sum(1 for n in plans.QUERIES if n.startswith("tpch"))
    assert main(["list", "tpch"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == n_tpch
    assert all(line.startswith("tpch_") and "[oracle]" in line for line in out)


def test_list_all_oracle_pinned(capsys):
    """Since round 5 EVERY registry query carries a DuckDB value-hash
    oracle — the listing must show zero [rows-only] tags, and exactly
    one [oracle] tag per registered query."""
    from big_data_imdb_classifier_spark import plans

    plans.load_all()
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "[rows-only]" not in out
    assert out.count("[oracle]") == len(plans.QUERIES)


def test_unknown_query_exits_2_with_close_matches(caplog):
    import logging

    with caplog.at_level(logging.ERROR, logger="big_data_imdb_classifier_spark.cli"):
        assert main(["run", "q5_local"]) == 2
    assert any(
        "tpch_q5_local_supplier_volume" in r.getMessage()
        for r in caplog.records
        if r.levelno == logging.ERROR
    )
