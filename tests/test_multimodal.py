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


def _png_bytes(width, height, color_type=6):
    """Minimal valid PNG built from stdlib (zlib + struct)."""
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = b"".join(b"\x00" + b"\x7f" * (width * n_ch) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _wav_bytes(rate=16000, n_frames=8000, channels=2):
    """Valid WAV built from stdlib wave."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x01" * n_frames * channels)
    return buf.getvalue()


def test_real_decode_png():
    meta = MM.decode_real("image", _png_bytes(320, 200, color_type=2))
    assert (meta["width"], meta["height"], meta["channels"]) == (320, 200, 3)
    meta = MM.decode_real("image", _png_bytes(17, 5, color_type=6))
    assert (meta["width"], meta["height"], meta["channels"]) == (17, 5, 4)


def test_real_decode_gif_and_jpeg_headers():
    gif = b"GIF89a" + (240).to_bytes(2, "little") + (135).to_bytes(2, "little")
    meta = MM.decode_real("image", gif + b"\x00" * 16)
    assert (meta["width"], meta["height"]) == (240, 135)
    # JPEG: SOI + APP0 stub + SOF0 (height=480, width=640, 3 components)
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (480).to_bytes(2, "big") + (640).to_bytes(2, "big") + b"\x03"
    )
    meta = MM.decode_real("image", jpeg)
    assert (meta["width"], meta["height"], meta["channels"]) == (640, 480, 3)


def test_real_decode_wav():
    meta = MM.decode_real("audio", _wav_bytes(rate=16000, n_frames=8000))
    assert meta["sample_rate"] == 16000
    assert meta["duration_ms"] == 500
    assert meta["channels"] == 2


def test_real_decode_rejects_garbage_and_gates_video():
    with pytest.raises(ValueError):
        MM.decode_real("image", b"\x89PNG")  # truncated container
    with pytest.raises(ValueError):
        MM.decode_real("audio", b"not audio at all")
    try:
        import av  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            MM.decode_real("video", b"anything")


def test_decode_metadata_with_real_decoder_over_real_payloads(spark):
    """The mapInPandas operator runs decode_real over genuine PNG/WAV
    payloads; corrupt rows degrade to null metadata, never fail."""
    rows = [
        (1, "image", bytearray(_png_bytes(64, 32, color_type=2))),
        (2, "audio", bytearray(_wav_bytes(rate=8000, n_frames=4000))),
        (3, "image", bytearray(b"corrupt-not-a-png")),
        (4, "audio", bytearray(b"RIFF")),  # truncated: wave raises EOFError
        (5, "video", bytearray(b"\x00" * 32)),  # no codec -> NotImplementedError
    ]
    corpus = spark.createDataFrame(
        rows, "doc_id long, media_type string, content binary"
    )
    got = {
        r.doc_id: r
        for r in MM.decode_metadata(corpus, decoder=MM.decode_real).collect()
    }
    assert (got[1].width, got[1].height, got[1].channels) == (64, 32, 3)
    assert (got[2].sample_rate, got[2].duration_ms) == (8000, 500)
    assert got[3].width is None and got[3].sample_rate is None
    assert got[3].byte_len == len(b"corrupt-not-a-png")
    # truncated RIFF (EOFError inside stdlib wave) and a codec-less
    # modality (NotImplementedError) both degrade to null metadata
    # instead of failing the task
    assert got[4].sample_rate is None and got[4].byte_len == 4
    assert got[5].width is None and got[5].n_frames is None
