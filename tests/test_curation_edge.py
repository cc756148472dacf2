"""Edge-case regression tests for the curation queries.

Driver-advice regression (r5 ADVICE #2): `dsir_importance_select` built
bigrams via sequence(1, size(t)-1) with no short-doc guard — for a
document with <2 tokens Spark's sequence(1, 0) yields a DESCENDING
[1, 0] and element_at(t, 0) raises at runtime, while the DuckDB
oracle's generate_series(1, 0) is simply empty. The corpus shipped by
the driver happens to have >=10 tokens per doc, so only a synthetic
short-doc corpus exercises the divergence.
"""

from __future__ import annotations

import duckdb
import pytest

from big_data_imdb_classifier_spark.plans import load_all, QUERIES, ORACLES
from tests.oracle_harness import compare


@pytest.fixture(scope="module")
def short_doc_dir(spark, tmp_path_factory):
    """A documents table whose pool side contains 0-, 1- and 2-token
    docs alongside normal ones (target sources src1-3, pool src9)."""
    rows = []
    texts = [
        "",  # 0 tokens
        "solo",  # 1 token — the crashing case
        "two tokens",  # minimal bigram
        "   ",  # whitespace-only -> 0 tokens
        "a proper document with enough tokens to weigh",
    ]
    for i, txt in enumerate(texts):
        rows.append((i, txt, "en", "src9", len(txt)))
    # Target-domain docs (also include a short one so the target side of
    # the bucket counts exercises the guard too).
    rows.append((100, "tiny", "en", "src1", 4))
    rows.append((101, "target domain text with several shared tokens", "en", "src2", 46))
    rows.append((102, "more target domain text with shared tokens", "en", "src3", 43))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = tmp_path_factory.mktemp("shortdocs")
    df.coalesce(1).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    return str(out)


def test_dsir_short_docs_no_crash_and_oracle_match(spark, short_doc_dir):
    load_all()
    result = QUERIES["dsir_importance_select"](spark, short_doc_dir)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{short_doc_dir}/documents.parquet/*.parquet')"
    )
    # Raises on any rows/schema/hash mismatch; previously the Spark side
    # raised "SQL array indices start at 1" before producing rows.
    compare(result, con, ORACLES["dsir_importance_select"])
    picked = {r.doc_id for r in result.collect()}
    assert 4 in picked  # the only multi-bigram pool doc must survive
    assert 0 not in picked and 1 not in picked and 3 not in picked
