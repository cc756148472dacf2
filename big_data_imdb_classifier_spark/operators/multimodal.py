"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The engine's multimodal contract: media lives in an opaque ``binary``
column beside typed metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``
so bytes never leave the executors and never take the row-at-a-time
Python path.

Because this container has no codec libraries (PIL/librosa/av), the
*decode* step is a clearly-marked deterministic fake: metadata is derived
from the md5 of the content bytes (``_fake_decode``), and real decoding
is stubbed behind ``decode_real`` which raises ``NotImplementedError``
unless a codec library is importable.  Everything AROUND the stub — the
binary column plumbing, Arrow batch shapes, metadata schema, explode of
sampled frames, byte-level feature extraction — is real and tested; a
deployment swaps ``_fake_decode`` for a codec call and nothing else
changes.

Scale notes (100 TB of media):
* content stays in one ``binary`` column → Parquet keeps it in its own
  chunk; metadata-only queries never read the bytes (column pruning).
* each transform is one ``mapInPandas`` pass — no shuffle; partition
  sizing is governed by ``spark.sql.files.maxPartitionBytes`` and
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set the latter low,
  e.g. 64, when rows carry multi-MB payloads so an Arrow batch fits in
  executor memory).
* frame sampling explodes videos by a bounded factor (≤ max_frames) —
  predictable amplification, no skew beyond payload-size variance.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ["image", "audio", "video"]
SAMPLE_RATES = [8000, 16000, 22050, 44100]
VIDEO_FPS = 24
MAX_SAMPLED_FRAMES = 8

# Typed metadata: one nullable struct column; fields are populated per
# media_type (image → width/height/channels, audio → sample_rate/
# duration_ms, video → width/height/n_frames/fps).
METADATA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("channels", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("fps", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("std_byte", T.DoubleType(), True),
        T.StructField("n_distinct_bytes", T.LongType(), True),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("frame_no", T.LongType(), True),
        T.StructField("frame_idx", T.LongType(), True),
        T.StructField("frame_ts_ms", T.LongType(), True),
    ]
)

THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("thumbnail", T.BinaryType(), True),
    ]
)


def multimodal_corpus(docs: DataFrame) -> DataFrame:
    """Binary media corpus derived deterministically from ``documents``:
    content = UTF-8 bytes of the text (an opaque payload as far as every
    operator below is concerned), media_type cycles by doc_id.  In
    production this is ``spark.read.format('binaryFile')`` or a parquet
    with a real binary column — same schema, same operators.
    """
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
    )


def _hx(h: str, i: int, j: int) -> int:
    return int(h[i:j], 16)


def _fake_decode(media_type: str, content: bytes) -> dict:
    """STUB decode: deterministic metadata from md5(content).  Replace
    with PIL / librosa / av in a real deployment (see decode_real)."""
    h = hashlib.md5(content).hexdigest()
    meta = dict(
        byte_len=len(content),
        width=None,
        height=None,
        channels=None,
        n_frames=None,
        fps=None,
        sample_rate=None,
        duration_ms=None,
    )
    if media_type == "image":
        meta.update(
            width=_hx(h, 0, 4) % 512 + 16,
            height=_hx(h, 4, 8) % 512 + 16,
            channels=3,
        )
    elif media_type == "audio":
        meta.update(
            sample_rate=SAMPLE_RATES[_hx(h, 0, 4) % len(SAMPLE_RATES)],
            duration_ms=_hx(h, 4, 8) % 60000 + 1000,
        )
    elif media_type == "video":
        meta.update(
            width=_hx(h, 0, 4) % 256 + 16,
            height=_hx(h, 4, 8) % 256 + 16,
            n_frames=_hx(h, 8, 12) % 240 + 16,
            fps=VIDEO_FPS,
        )
    return meta


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_image_header(content: bytes) -> dict | None:
    """Dependency-free image metadata from the container header (public
    formats: PNG IHDR, GIF logical screen descriptor, JPEG SOF marker).
    Returns None when the payload is not a recognized image container."""
    if content.startswith(_PNG_SIG) and len(content) >= 26:
        return dict(
            width=int.from_bytes(content[16:20], "big"),
            height=int.from_bytes(content[20:24], "big"),
            channels=_PNG_CHANNELS.get(content[25], 3),
        )
    if content[:6] in (b"GIF87a", b"GIF89a") and len(content) >= 10:
        return dict(
            width=int.from_bytes(content[6:8], "little"),
            height=int.from_bytes(content[8:10], "little"),
            channels=3,
        )
    if content[:2] == b"\xff\xd8":  # JPEG: walk markers to an SOF segment
        i = 2
        while i + 9 < len(content):
            if content[i] != 0xFF:
                break
            marker = content[i + 1]
            seg_len = int.from_bytes(content[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return dict(
                    height=int.from_bytes(content[i + 5 : i + 7], "big"),
                    width=int.from_bytes(content[i + 7 : i + 9], "big"),
                    channels=content[i + 9],
                )
            i += 2 + seg_len
    return None


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Iterate ISO BMFF boxes as (type, body_start, body_end); tolerant
    of truncation (stops instead of raising)."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(buf[i : i + 4], "big")
        btype = buf[i + 4 : i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize follows the type
            if i + 16 > end:
                return
            size = int.from_bytes(buf[i + 8 : i + 16], "big")
            body = i + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - i
        if size < 8 or i + size > end:
            return
        yield btype, body, i + size
        i += size


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def _parse_mp4_header(content: bytes) -> dict | None:
    """Dependency-free MP4/MOV probe: walks the public ISO BMFF box tree
    (ISO/IEC 14496-12) for ``mvhd`` (timescale/duration → duration_ms),
    the video track's ``tkhd`` (16.16 fixed-point width/height) and
    ``stsz`` (sample_count → n_frames). stdlib-only, same approach as
    the PNG/JPEG/WAV parsers."""
    head = _mp4_boxes(content, 0, len(content))
    first = next(head, None)
    if first is None or first[0] != b"ftyp":
        return None
    found: dict[bytes, bytes] = {}

    def walk(start: int, end: int) -> None:
        for btype, b0, b1 in _mp4_boxes(content, start, end):
            if btype in _MP4_CONTAINERS:
                walk(b0, b1)
            elif btype in (b"mvhd", b"tkhd", b"stsz") and btype not in found:
                found[btype] = content[b0:b1]

    walk(0, len(content))
    if b"mvhd" not in found:
        return None
    meta = dict(width=None, height=None, n_frames=None, fps=None,
                duration_ms=None)
    mv = found[b"mvhd"]
    if len(mv) >= 4:
        if mv[0] == 1 and len(mv) >= 32:  # v1: 8-byte times/duration
            scale = int.from_bytes(mv[20:24], "big")
            dur = int.from_bytes(mv[24:32], "big")
        elif len(mv) >= 20:
            scale = int.from_bytes(mv[12:16], "big")
            dur = int.from_bytes(mv[16:20], "big")
        else:
            scale = 0
            dur = 0
        if scale:
            meta["duration_ms"] = dur * 1000 // scale
    tk = found.get(b"tkhd")
    if tk is not None and len(tk) >= 4:
        # width/height are the LAST 8 bytes of the fixed-layout body on
        # both versions (v0 body 84 B, v1 body 96 B)
        body_len = 96 if tk[0] == 1 else 84
        if len(tk) >= body_len:
            meta["width"] = int.from_bytes(
                tk[body_len - 8 : body_len - 4], "big") >> 16
            meta["height"] = int.from_bytes(
                tk[body_len - 4 : body_len], "big") >> 16
    sz = found.get(b"stsz")
    if sz is not None and len(sz) >= 12:
        meta["n_frames"] = int.from_bytes(sz[8:12], "big")
    if meta["n_frames"] and meta["duration_ms"]:
        meta["fps"] = round(meta["n_frames"] * 1000 / meta["duration_ms"])
    return meta


def _parse_avi_header(content: bytes) -> dict | None:
    """Dependency-free AVI probe: the RIFF ``avih`` main header carries
    µs-per-frame, total frames, and frame dimensions (little-endian
    u32s, public AVIMAINHEADER layout)."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        return None
    i = content.find(b"avih")
    if i < 0 or i + 48 > len(content):
        return None
    u32 = lambda off: int.from_bytes(  # noqa: E731
        content[i + off : i + off + 4], "little"
    )
    us_per_frame, n_frames = u32(8), u32(24)
    width, height = u32(40), u32(44)
    meta = dict(width=width or None, height=height or None,
                n_frames=n_frames or None, fps=None, duration_ms=None)
    if us_per_frame:
        meta["fps"] = round(1_000_000 / us_per_frame)
        meta["duration_ms"] = n_frames * us_per_frame // 1000
    return meta


def _parse_video_header(content: bytes) -> dict | None:
    return _parse_mp4_header(content) or _parse_avi_header(content)


def decode_real(media_type: str, content: bytes) -> dict:
    """REAL metadata decode for the formats this environment can handle
    without optional codec libraries, with library hooks where it can't:

    - image: PIL when installed; else a dependency-free header parse of
      PNG/GIF/JPEG (public container formats).
    - audio: soundfile when installed; else stdlib ``wave`` for WAV.
    - video: av when installed; else a dependency-free header parse of
      MP4/MOV (ISO BMFF boxes) and AVI (RIFF avih) — dimensions, frame
      count, fps, duration; no pixel decode.

    Same dict shape as ``_fake_decode`` so the mapInPandas operators are
    decoder-agnostic; unsupported payloads raise ValueError (caller maps
    to a null-metadata row, never a job failure).
    """
    meta = dict(
        byte_len=len(content), width=None, height=None, channels=None,
        n_frames=None, fps=None, sample_rate=None, duration_ms=None,
    )
    if media_type == "image":
        try:
            import io

            import PIL.Image

            with PIL.Image.open(io.BytesIO(content)) as im:
                meta.update(
                    width=im.width, height=im.height,
                    channels=len(im.getbands()),
                )
                return meta
        except ImportError:
            pass
        except Exception:
            # PIL rejects corrupt payloads with UnidentifiedImageError
            # (an OSError), not ValueError — fall through to the header
            # parse, which raises the contractual ValueError if it also
            # fails.
            pass
        parsed = _parse_image_header(content)
        if parsed is None:
            raise ValueError("unrecognized image container")
        meta.update(parsed)
        return meta
    if media_type == "audio":
        import io

        try:
            import soundfile

            info = soundfile.info(io.BytesIO(content))
            meta.update(
                sample_rate=int(info.samplerate),
                duration_ms=int(info.frames * 1000 / info.samplerate),
                channels=info.channels,
            )
            return meta
        except ImportError:
            pass
        except Exception:
            # libsndfile rejections (LibsndfileError, a RuntimeError)
            # fall through to the stdlib WAV parser below.
            pass
        import wave

        try:
            with wave.open(io.BytesIO(content)) as w:
                rate = w.getframerate()
                meta.update(
                    sample_rate=rate,
                    duration_ms=int(w.getnframes() * 1000 / rate),
                    channels=w.getnchannels(),
                )
                return meta
        except (wave.Error, EOFError) as ex:
            # wave raises EOFError (not wave.Error) on payloads shorter
            # than a RIFF chunk header — both mean "not a WAV".
            raise ValueError(f"unrecognized audio container: {ex}") from ex
    if media_type == "video":
        try:
            import io

            import av

            with av.open(io.BytesIO(content)) as container:
                vs = next(
                    (s for s in container.streams if s.type == "video"), None
                )
                if vs is not None:
                    dur = container.duration  # av time_base: µs
                    meta.update(
                        width=vs.codec_context.width,
                        height=vs.codec_context.height,
                        n_frames=vs.frames or None,
                        fps=round(float(vs.average_rate))
                        if vs.average_rate
                        else None,
                        duration_ms=dur // 1000 if dur else None,
                    )
                    return meta
        except ImportError:
            pass
        except Exception:
            # av rejects corrupt containers with av.error.* (OSError
            # subclasses) — fall through to the header parse.
            pass
        parsed = _parse_video_header(content)
        if parsed is None:
            raise ValueError("unrecognized video container")
        meta.update(parsed)
        return meta
    raise ValueError(f"unknown media_type {media_type!r}")


def decode_metadata(corpus: DataFrame, decoder=None) -> DataFrame:
    """Binary → typed metadata via one Arrow ``mapInPandas`` pass.

    ``decoder(media_type, content) -> dict`` defaults to the
    deterministic ``_fake_decode`` (oracle-checkable). Pass
    ``decode_real`` over genuine media payloads; a payload the decoder
    rejects (ValueError) or a media type it cannot handle in this
    environment (NotImplementedError — e.g. video without the ``av``
    package) yields a null-metadata row instead of failing the task — a
    100 TB corpus always contains corrupt files, and one missing codec
    must not kill the scan of every other modality.
    """
    decode = decoder if decoder is not None else _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, m, c in zip(pdf["doc_id"], pdf["media_type"], pdf["content"]):
                try:
                    meta = decode(m, bytes(c))
                except (ValueError, NotImplementedError):
                    meta = dict(
                        byte_len=len(bytes(c)), width=None, height=None,
                        channels=None, n_frames=None, fps=None,
                        sample_rate=None, duration_ms=None,
                    )
                rows.append({"doc_id": d, "media_type": m, **meta})
            yield pd.DataFrame(rows, columns=[f.name for f in METADATA_SCHEMA])

    return corpus.mapInPandas(run, schema=METADATA_SCHEMA)


def byte_features(corpus: DataFrame) -> DataFrame:
    """Byte-level content features (mean/population-std/cardinality of the
    byte distribution) — numpy over Arrow batches; the vectorized shape a
    real embedding/feature extractor would use."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, m, c in zip(pdf["doc_id"], pdf["media_type"], pdf["content"]):
                a = np.frombuffer(bytes(c), dtype=np.uint8)
                out.append(
                    {
                        "doc_id": d,
                        "media_type": m,
                        "byte_len": int(a.size),
                        "mean_byte": float(a.mean()) if a.size else None,
                        "std_byte": float(a.std()) if a.size else None,
                        "n_distinct_bytes": int(np.unique(a).size),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURES_SCHEMA])

    return corpus.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(
    corpus: DataFrame, max_frames: int = MAX_SAMPLED_FRAMES
) -> DataFrame:
    """Uniform frame sampling for videos: ≤ ``max_frames`` rows per video
    with frame index + timestamp.  The explode happens inside the pandas
    batch (bounded amplification); a real sampler would also slice the
    frame bytes here."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, m, c in zip(pdf["doc_id"], pdf["media_type"], pdf["content"]):
                if m != "video":
                    continue
                meta = _fake_decode(m, bytes(c))
                n, fps = meta["n_frames"], meta["fps"]
                stride = max(1, n // max_frames)
                for i in range(min(max_frames, n)):
                    idx = i * stride
                    out.append(
                        {
                            "doc_id": d,
                            "frame_no": i,
                            "frame_idx": idx,
                            "frame_ts_ms": idx * 1000 // fps,
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAMES_SCHEMA])

    return corpus.mapInPandas(run, schema=FRAMES_SCHEMA)


def resize_images(corpus: DataFrame, width: int, height: int) -> DataFrame:
    """Thumbnail pipeline plumbing: images in, fixed-size binary out.
    The resample itself is the stubbed step (digest bytes stand in for
    pixel data); schema/batching/partitioning are the real contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, m, c in zip(pdf["doc_id"], pdf["media_type"], pdf["content"]):
                if m != "image":
                    continue
                out.append(
                    {
                        "doc_id": d,
                        "width": width,
                        "height": height,
                        "thumbnail": hashlib.md5(bytes(c)).digest(),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in THUMB_SCHEMA])

    return corpus.mapInPandas(run, schema=THUMB_SCHEMA)


CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("chunk_no", T.LongType(), True),
        T.StructField("start_ms", T.LongType(), True),
        T.StructField("end_ms", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
    ]
)


def chunk_audio(corpus: DataFrame, chunk_ms: int = 10_000) -> DataFrame:
    """Fixed-duration audio chunking (the audio twin of sample_frames):
    each audio row explodes into ceil(duration/chunk) chunk descriptors
    with sample counts from the stub-decoded sample_rate.  A real
    implementation slices the payload bytes at the same offsets; the
    bounded explode and Arrow batch shape are identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, m, c in zip(pdf["doc_id"], pdf["media_type"], pdf["content"]):
                if m != "audio":
                    continue
                meta = _fake_decode(m, bytes(c))
                dur, rate = meta["duration_ms"], meta["sample_rate"]
                n_chunks = (dur + chunk_ms - 1) // chunk_ms
                for i in range(n_chunks):
                    start = i * chunk_ms
                    end = min(dur, start + chunk_ms)
                    out.append(
                        {
                            "doc_id": d,
                            "chunk_no": i,
                            "start_ms": start,
                            "end_ms": end,
                            "n_samples": (end - start) * rate // 1000,
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in CHUNKS_SCHEMA])

    return corpus.mapInPandas(run, schema=CHUNKS_SCHEMA)
