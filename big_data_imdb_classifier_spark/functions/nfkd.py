"""NFKD unicode fold — the one text op with no native Spark function.

Reproduces the reference's ``preprocess_text`` contract
(reference movie_pipeline/data_utils.py:159-184):

1. NFKD-normalize and drop non-ASCII codepoints,
2. strip every char outside ``[a-zA-Z0-9\\s]``,
3. trim whitespace,
4. Python ``str.title()`` casing,
5. empty result → NULL.

The reference runs this on the driver via ``df.toPandas().apply(...)``
(data_utils.py:204-206), cutting lineage and serializing the whole column
through the driver. Here it is a *scalar Arrow pandas_udf*: executors
receive Arrow batches, pandas' vectorized ``.str`` ops apply the fold, and
the plan stays lazy — the same code scales from 8k rows to 100 TB because
it is per-batch with no driver involvement.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _fold_one(s: str | None) -> str | None:
    if s is None:
        return None
    s = unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")
    s = "".join(ch for ch in s if ch.isalnum() or ch.isspace())
    s = s.strip().title()
    return s or None


@F.pandas_udf(T.StringType())
def nfkd_fold(batch: pd.Series) -> pd.Series:
    """Arrow-vectorized NFKD fold + punct strip + trim + title-case."""
    # NFKD itself has no pandas vectorized form; map stays inside the
    # executor over one Arrow batch at a time.
    return batch.map(_fold_one)


def nfkd_fold_col(text: Column | str) -> Column:
    return nfkd_fold(F.col(text) if isinstance(text, str) else text)
