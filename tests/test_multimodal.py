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


def _box(tag, body):
    import struct

    return struct.pack(">I", len(body) + 8) + tag + body


def _mp4_bytes(width=640, height=360, timescale=1000, duration=2500,
               n_frames=60, mvhd_version=0):
    """Minimal structurally-valid MP4 built from stdlib struct: ftyp +
    moov(mvhd + trak(tkhd + mdia(minf(stbl(stsz)))))."""
    import struct

    if mvhd_version == 1:
        mvhd = (b"\x01\x00\x00\x00" + b"\x00" * 16
                + struct.pack(">I", timescale) + struct.pack(">Q", duration)
                + b"\x00" * 80)
    else:
        mvhd = (b"\x00" * 4 + b"\x00" * 8
                + struct.pack(">II", timescale, duration) + b"\x00" * 80)
    tkhd = (b"\x00" * 76  # v0 fixed layout up to width/height
            + struct.pack(">II", width << 16, height << 16))
    stsz = b"\x00" * 4 + struct.pack(">II", 0, n_frames)
    stbl = _box(b"stbl", _box(b"stsz", stsz))
    trak = _box(b"trak", _box(b"tkhd", tkhd)
                + _box(b"mdia", _box(b"minf", stbl)))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak)
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


def _avi_bytes(width=320, height=240, us_per_frame=40000, n_frames=100):
    import struct

    avih = struct.pack(
        "<10I", us_per_frame, 0, 0, 0, n_frames, 0, 1, 0, width, height
    ) + b"\x00" * 16
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl" \
        + b"avih" + struct.pack("<I", len(avih)) + avih
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl)) + b"AVI " + hdrl


def test_real_decode_mp4_header():
    meta = MM.decode_real("video", _mp4_bytes(
        width=640, height=360, timescale=1000, duration=2500, n_frames=60))
    assert (meta["width"], meta["height"]) == (640, 360)
    assert meta["duration_ms"] == 2500
    assert meta["n_frames"] == 60
    assert meta["fps"] == 24  # 60 frames / 2.5 s
    # 64-bit mvhd (version 1) variant
    meta = MM.decode_real("video", _mp4_bytes(
        width=1920, height=1080, timescale=600, duration=1200,
        n_frames=48, mvhd_version=1))
    assert (meta["width"], meta["height"]) == (1920, 1080)
    assert meta["duration_ms"] == 2000


def test_real_decode_avi_header():
    meta = MM.decode_real("video", _avi_bytes(
        width=320, height=240, us_per_frame=40000, n_frames=100))
    assert (meta["width"], meta["height"]) == (320, 240)
    assert meta["fps"] == 25
    assert meta["duration_ms"] == 4000
    assert meta["n_frames"] == 100


def test_real_decode_rejects_garbage():
    with pytest.raises(ValueError):
        MM.decode_real("image", b"\x89PNG")  # truncated container
    with pytest.raises(ValueError):
        MM.decode_real("audio", b"not audio at all")
    with pytest.raises(ValueError):
        MM.decode_real("video", b"not a video container")
    with pytest.raises(ValueError):
        # a lone ftyp with a truncated moov must not crash the parser
        MM.decode_real("video", _mp4_bytes()[:40])


def test_decode_metadata_with_real_decoder_over_real_payloads(spark):
    """The mapInPandas operator runs decode_real over genuine PNG/WAV
    payloads; corrupt rows degrade to null metadata, never fail."""
    rows = [
        (1, "image", bytearray(_png_bytes(64, 32, color_type=2))),
        (2, "audio", bytearray(_wav_bytes(rate=8000, n_frames=4000))),
        (3, "image", bytearray(b"corrupt-not-a-png")),
        (4, "audio", bytearray(b"RIFF")),  # truncated: wave raises EOFError
        (5, "video", bytearray(b"\x00" * 32)),  # unrecognized container
        (6, "video", bytearray(_mp4_bytes(width=256, height=128,
                                          timescale=100, duration=300,
                                          n_frames=9))),
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
    # truncated RIFF (EOFError inside stdlib wave) and an unrecognized
    # video container both degrade to null metadata instead of failing
    # the task; a genuine MP4 decodes through the header probe
    assert got[4].sample_rate is None and got[4].byte_len == 4
    assert got[5].width is None and got[5].n_frames is None
    assert (got[6].width, got[6].height) == (256, 128)
    assert got[6].duration_ms == 3000 and got[6].n_frames == 9


def test_video_header_parsers_never_crash_on_corrupt_bytes():
    """Hypothesis fuzz: arbitrary byte soup — including truncations and
    bit-flips of a valid MP4/AVI — must yield a parse or None, never an
    exception (decode_metadata maps ValueError to a null row; an
    IndexError/struct.error would kill the executor task instead)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    valid_mp4 = _mp4_bytes()
    valid_avi = _avi_bytes()

    @given(
        data=st.one_of(
            st.binary(min_size=0, max_size=256),
            st.integers(min_value=0, max_value=len(valid_mp4)).map(
                lambda n: valid_mp4[:n]
            ),
            st.integers(min_value=0, max_value=len(valid_avi)).map(
                lambda n: valid_avi[:n]
            ),
            st.tuples(
                st.integers(min_value=0, max_value=len(valid_mp4) - 1),
                st.integers(min_value=0, max_value=255),
            ).map(
                lambda t: valid_mp4[: t[0]] + bytes([t[1]])
                + valid_mp4[t[0] + 1:]
            ),
        )
    )
    @settings(max_examples=300, deadline=None)
    def check(data):
        out = MM._parse_video_header(data)
        assert out is None or isinstance(out, dict)
        try:
            MM.decode_real("video", data)
        except ValueError:
            pass  # the contractual rejection path

    check()
