"""Enrichment-framework queries (S5+S9, F7/F8).

The registered query runs the full distributed enrichment path —
anti-join cache probe shape + mapInPandas executor inference — with the
deterministic mock batch function, whose md5-derived topic mapping the
DuckDB oracle restates exactly. So the Arrow-UDF plumbing itself is
hash-match verified, not just rows-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import enrichment as EN
from ..sources.readers import load_table
from .registry import query

_VOCAB_SQL = "[" + ", ".join(f"'{t}'" for t in EN.TOPIC_VOCAB) + "]"


@query(
    "enrich_mock_llm_topics",
    oracle=f"""
    SELECT doc_id,
      ({_VOCAB_SQL})[
        (CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT)
         % {len(EN.TOPIC_VOCAB)}) + 1
      ] AS topic
    FROM documents ORDER BY doc_id
    """,
)
def enrich_mock_llm_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch 'LLM' topic enrichment of documents through the cache-first
    mapInPandas framework (cacheless run: pure executor inference).
    Prompt templating (F7) and response normalization (F8) both run
    inside the batch function."""
    docs = load_table(spark, sf_dir, "documents")
    return EN.enrich_with_cache(
        spark,
        docs,
        key_col="doc_id",
        text_col="text",
        value_col="topic",
        cache_path=None,
    ).orderBy("doc_id")
