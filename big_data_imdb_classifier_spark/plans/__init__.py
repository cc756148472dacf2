"""Query registry: every operator from SURVEY.md §2 (plus the scale
extensions) registered as a named (spark_query, oracle_sql) pair."""

from .registry import ORACLES, QUERIES, query  # noqa: F401


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    from . import (  # noqa: F401
        queries_cdc,
        queries_curation,
        queries_enrichment,
        queries_events,
        queries_graph,
        queries_layout,
        queries_linkage,
        queries_ml,
        queries_multimodal,
        queries_relational,
        queries_similarity,
        queries_sources,
        queries_stats,
        queries_text,
        queries_tpch,
        queries_tpch_ps,
    )
