"""Multimodal binary-column plumbing: Arrow batch shapes, deterministic
stub decode, frame-sample amplification bounds, thumbnail byte contract,
and the real-decode stub gate."""

import hashlib

import pytest
from pyspark.sql import functions as F

from big_data_imdb_classifier_spark.operators import multimodal as MM
from big_data_imdb_classifier_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return MM.multimodal_corpus(load_table(spark, SF_DIR, "documents")).cache()


def test_corpus_binary_roundtrip(spark, corpus):
    """content is the UTF-8 bytes of text — decode() restores it."""
    docs = load_table(spark, SF_DIR, "documents")
    bad = (
        corpus.withColumn("back", F.decode("content", "UTF-8"))
        .join(docs, "doc_id")
        .where(F.col("back") != F.col("text"))
        .count()
    )
    assert bad == 0
    assert dict(corpus.dtypes)["content"] == "binary"


def test_decode_metadata_typed_and_deterministic(spark, corpus):
    meta = MM.decode_metadata(corpus)
    rows = {r.doc_id: r for r in meta.collect()}
    again = {r.doc_id: r for r in MM.decode_metadata(corpus).collect()}
    assert rows == again  # deterministic across runs
    src = {r.doc_id: bytes(r.content) for r in corpus.collect()}
    for doc_id, r in rows.items():
        expect = MM._fake_decode(r.media_type, src[doc_id])
        assert r.byte_len == expect["byte_len"] == len(src[doc_id])
        if r.media_type == "image":
            assert 16 <= r.width <= 527 and r.channels == 3
            assert r.n_frames is None and r.sample_rate is None
        elif r.media_type == "audio":
            assert r.sample_rate in MM.SAMPLE_RATES
            assert r.width is None and r.n_frames is None
        else:
            assert 16 <= r.n_frames <= 255 and r.fps == MM.VIDEO_FPS


def test_frame_sample_bounded_amplification(spark, corpus):
    frames = MM.sample_frames(corpus)
    per_doc = frames.groupBy("doc_id").count().collect()
    n_videos = corpus.where(F.col("media_type") == "video").count()
    assert len(per_doc) == n_videos
    assert all(r["count"] <= MM.MAX_SAMPLED_FRAMES for r in per_doc)
    # frame indices strictly increasing, timestamps consistent with fps
    r = frames.where(F.col("frame_no") == 1).first()
    assert r.frame_ts_ms == r.frame_idx * 1000 // MM.VIDEO_FPS


def test_resize_thumbnail_bytes(spark, corpus):
    thumbs = MM.resize_images(corpus, 64, 64)
    src = {r.doc_id: bytes(r.content) for r in corpus.collect()}
    for r in thumbs.collect():
        assert r.width == 64 and r.height == 64
        assert bytes(r.thumbnail) == hashlib.md5(src[r.doc_id]).digest()
    assert thumbs.count() == corpus.where(F.col("media_type") == "image").count()


def test_byte_features_match_numpy(spark, corpus):
    import numpy as np

    feats = {r.doc_id: r for r in MM.byte_features(corpus).collect()}
    for r in corpus.collect():
        a = np.frombuffer(bytes(r.content), dtype=np.uint8)
        f = feats[r.doc_id]
        assert f.byte_len == a.size
        assert abs(f.mean_byte - float(a.mean())) < 1e-9
        assert abs(f.std_byte - float(a.std())) < 1e-9
        assert f.n_distinct_bytes == int(np.unique(a).size)


def test_real_decode_is_gated(spark):
    with pytest.raises(NotImplementedError):
        MM.decode_real("image", b"\x89PNG")
