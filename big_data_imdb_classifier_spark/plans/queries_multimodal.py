"""Multimodal-column queries: binary payload + typed metadata, Arrow
mapInPandas decode / feature-extract / frame-sample / resize.

Decode is a deterministic stub (md5-derived metadata — see
operators/multimodal.py), which is exactly what makes the *plumbing*
hash-match verifiable: the corpus's binary column is the UTF-8 bytes of
``documents.text``, so the DuckDB oracle restates every md5/byte-level
derivation from the text column.  The oracle checks that real bytes made
a round trip through Arrow batches on executors — not a mock of the
pipeline, the pipeline with a mock decode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as MM
from ..sources.readers import load_table
from .registry import ROUND_DIGITS, query

_HX = "CAST(('0x' || substr(md5(text), {i}, 4)) AS BIGINT)"
_MEDIA = "(['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]"
_RATES = "([8000, 16000, 22050, 44100])"


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.multimodal_corpus(load_table(spark, sf_dir, "documents"))


@query(
    "mm_decode_metadata",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, {_MEDIA} AS media_type,
        octet_length(encode(text)) AS byte_len,
        {_HX.format(i=1)} AS h0, {_HX.format(i=5)} AS h1, {_HX.format(i=9)} AS h2
      FROM documents
    )
    SELECT doc_id, media_type, byte_len,
      CASE media_type WHEN 'image' THEN h0 % 512 + 16
                      WHEN 'video' THEN h0 % 256 + 16 END AS width,
      CASE media_type WHEN 'image' THEN h1 % 512 + 16
                      WHEN 'video' THEN h1 % 256 + 16 END AS height,
      CASE media_type WHEN 'image' THEN CAST(3 AS BIGINT) END AS channels,
      CASE media_type WHEN 'video' THEN h2 % 240 + 16 END AS n_frames,
      CASE media_type WHEN 'video' THEN CAST({MM.VIDEO_FPS} AS BIGINT) END AS fps,
      CASE media_type WHEN 'audio'
           THEN CAST({_RATES}[CAST(h0 % 4 AS INT) + 1] AS BIGINT) END AS sample_rate,
      CASE media_type WHEN 'audio' THEN h1 % 60000 + 1000 END AS duration_ms
    FROM m ORDER BY doc_id
    """,
)
def mm_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → typed metadata (stub decode) through one mapInPandas
    pass; the oracle restates the md5 derivation per media type."""
    return MM.decode_metadata(_corpus(spark, sf_dir)).orderBy("doc_id")


@query(
    "mm_byte_stats",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, {_MEDIA} AS media_type,
        list_transform(string_split(text, ''), c -> ord(c)) AS bytes
      FROM documents
    )
    SELECT doc_id, media_type,
      len(bytes)::BIGINT AS byte_len,
      round(list_avg(bytes), {ROUND_DIGITS}) AS mean_byte,
      round(list_aggregate(bytes, 'stddev_pop'), {ROUND_DIGITS}) AS std_byte,
      len(list_distinct(bytes))::BIGINT AS n_distinct_bytes
    FROM b ORDER BY doc_id
    """,
)
def mm_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-distribution features via numpy over Arrow batches.  The
    oracle recomputes them char-wise (the corpus is ASCII, so codepoint
    == byte) — a full hash-match on the Arrow byte path."""
    out = MM.byte_features(_corpus(spark, sf_dir))
    return out.select(
        "doc_id",
        "media_type",
        "byte_len",
        F.round("mean_byte", ROUND_DIGITS).alias("mean_byte"),
        F.round("std_byte", ROUND_DIGITS).alias("std_byte"),
        "n_distinct_bytes",
    ).orderBy("doc_id")


@query(
    "mm_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, {_HX.format(i=9)} % 240 + 16 AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    ),
    f AS (
      SELECT doc_id, n_frames,
        unnest(generate_series(0, {MM.MAX_SAMPLED_FRAMES - 1})) AS frame_no
      FROM v
    )
    SELECT doc_id, frame_no::BIGINT AS frame_no,
      (frame_no * (n_frames // {MM.MAX_SAMPLED_FRAMES}))::BIGINT AS frame_idx,
      (frame_no * (n_frames // {MM.MAX_SAMPLED_FRAMES}) * 1000
         // {MM.VIDEO_FPS})::BIGINT AS frame_ts_ms
    FROM f ORDER BY doc_id, frame_no
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform frame sampling of the video rows (bounded explode inside
    the pandas batch); stub n_frames is ≥ 16, so every video yields
    exactly MAX_SAMPLED_FRAMES rows with stride n_frames // 8."""
    return MM.sample_frames(_corpus(spark, sf_dir)).orderBy("doc_id", "frame_no")


@query(
    "mm_resize_thumbnails",
    oracle="""
    SELECT doc_id,
           CAST(64 AS BIGINT) AS width,
           CAST(64 AS BIGINT) AS height,
           CAST(16 AS BIGINT) AS thumb_bytes
    FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id
    """,
)
def mm_resize_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail plumbing for the image rows — fixed target dims, binary
    payload out (stub resample). The binary column itself can't
    canonicalize through the SQL compare, but everything AROUND it can:
    the oracle pins media-type routing (image ⇔ doc_id % 3 = 0), row
    cardinality, the requested dims, and the stub digest's byte length —
    so the mapInPandas plumbing (schema, batching, row filtering) is
    driver-gated; payload determinism stays pytest-gated
    (tests/test_multimodal.py)."""
    thumbs = MM.resize_images(_corpus(spark, sf_dir), width=64, height=64)
    return thumbs.select(
        "doc_id", "width", "height", F.length("thumbnail").alias("thumb_bytes")
    ).orderBy("doc_id")


@query(
    "mm_audio_chunks",
    oracle=f"""
    WITH a AS (
      SELECT doc_id,
        {_HX.format(i=5)} % 60000 + 1000 AS dur,
        CAST({_RATES}[CAST({_HX.format(i=1)} % 4 AS INT) + 1] AS BIGINT) AS rate
      FROM documents WHERE doc_id % 3 = 1
    ),
    c AS (
      SELECT doc_id, dur, rate,
        unnest(generate_series(0, CAST((dur + 9999) // 10000 AS INT) - 1))
          AS chunk_no
      FROM a
    )
    SELECT doc_id, chunk_no::BIGINT AS chunk_no,
      (chunk_no * 10000)::BIGINT AS start_ms,
      least(dur, chunk_no * 10000 + 10000)::BIGINT AS end_ms,
      ((least(dur, chunk_no * 10000 + 10000) - chunk_no * 10000) * rate
        // 1000)::BIGINT AS n_samples
    FROM c ORDER BY doc_id, chunk_no
    """,
)
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 10s audio chunking of the audio rows (bounded explode in the
    pandas batch) — chunk boundaries and sample counts hash-matched from
    the md5-derived stub metadata."""
    return MM.chunk_audio(_corpus(spark, sf_dir), chunk_ms=10_000).orderBy(
        "doc_id", "chunk_no"
    )
