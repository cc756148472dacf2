"""Oracle-differential tests: every registered query with an oracle is run
through Spark AND DuckDB and compared with driver semantics.

Runs at sf0.001 for speed in the default suite; set
SPARK_GRAFT_ORACLE_SF=sf0.01 to reproduce the driver's exact gate.
"""

from __future__ import annotations

import pytest

from big_data_imdb_classifier_spark import plans

from .conftest import SF_SMOKE
from .oracle_harness import compare

plans.load_all()

ORACLE_NAMES = sorted(plans.ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, spark, duck_smoke):
    df = plans.QUERIES[name](spark, SF_SMOKE)
    compare(df, duck_smoke, plans.ORACLES[name])


def test_all_queries_return_rows(spark):
    for name, fn in plans.QUERIES.items():
        n = fn(spark, SF_SMOKE).count()
        assert n >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"nation", "custkey", "cust_name", "revenue"}
