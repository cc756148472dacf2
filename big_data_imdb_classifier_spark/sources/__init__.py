"""Typed sources and sinks: explicit schemas, parquet/csv/json readers."""

from .readers import (  # noqa: F401
    load_column_dict_json,
    load_csv,
    load_csv_glob,
    load_json,
    load_table,
    load_tables,
)
from .schemas import TESTDATA_SCHEMAS, imdb_train_schema  # noqa: F401
