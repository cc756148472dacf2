"""Temporal scalar helpers.

Spark forbids a direct ``TIMESTAMP_NTZ → BIGINT`` cast
(DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION), while ``TIMESTAMP → BIGINT``
yields epoch seconds. Any operator that needs epoch arithmetic over a
timestamp column of *either* flavor should go through
:func:`epoch_seconds`, which routes via an intermediate ``timestamp``
cast — a no-op for LTZ input, and an NTZ→LTZ reinterpretation (in the
session timezone, pinned UTC by ``sources.readers.load_table``) for NTZ
input. Both casts fold into one codegen'd projection; no extra pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Epoch-seconds of a timestamp column, NTZ-safe.

    ``cast("timestamp")`` first (identity for LTZ; legal NTZ→LTZ
    reinterpretation for NTZ), then ``cast("long")`` for epoch seconds.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")
