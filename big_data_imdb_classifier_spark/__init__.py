"""big_data_imdb_classifier_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine providing the full query / data-processing
capability surface of the reference repo ``chizo4/Big-Data-IMDB-Classifier``
(surveyed in /root/repo/SURVEY.md), re-expressed as idiomatic PySpark
DataFrame / SQL / MLlib / Structured Streaming, plus the large-scale
training-data-pipeline extensions (dedup, similarity search, text analysis,
event-time windows, multimodal plumbing).

Design rules (enforced from the first commit):

* DataFrame everywhere; one unbroken lazy plan per output.
* Explicit ``StructType`` schemas — never ``inferSchema`` at scale.
* No driver materialization except final tiny results.
* Built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched
  pandas UDFs / ``mapInPandas`` only where built-ins can't express the
  semantics (NFKD fold, external enrichment, multimodal decode).
* Broadcast small dimensions, AQE on, shuffle partitions sized to cores.
"""

__version__ = "0.1.0"
