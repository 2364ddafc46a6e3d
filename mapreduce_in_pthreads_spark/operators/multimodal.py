"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas`` (north-star
BASELINE.json 'Multimodal columns').

``decode_image`` is a real decoder: it parses PNG / GIF / BMP / JPEG
container headers (public file-format specs) in pure Python, and
upgrades to Pillow transparently when the library exists (it is not
baked into this container). Full pixel decode of compressed formats
without a codec library is out of scope — the header parse extracts
the fields a curation pipeline filters on (format, width, height).
The pipeline queries exercise it end-to-end over binary columns
built in-flight (``encode_bmp`` emits real spec-valid BMP files).

Scale notes: payload bytes travel Spark→Python as Arrow buffers (zero
row-at-a-time serialization); metadata extraction is embarrassingly
parallel per batch; at 100 TB you'd store payloads in parquet binary
columns exactly like this, partitioned by modality/date.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

BLOB_META_SCHEMA = (
    "doc_id bigint, n_bytes int, first4_hex string, sha256 string"
)


def _make_codec():
    """Build the codec functions DYNAMICALLY so cloudpickle serializes
    them by value (their qualname is not importable): UDF closures that
    capture them then run on executors whose Python workers have never
    seen this package on PYTHONPATH — the same portability contract as
    the closure-based batch functions below."""

    def decode_image(payload: bytes) -> tuple[str, int, int]:
        """Decode an image payload to ``(format, width, height)``.

        Pure-Python container-header decode for PNG, GIF, BMP, and
        JPEG (per their public specs: PNG IHDR big-endian dims at
        offset 16, GIF logical-screen little-endian uint16 at 6/8, BMP
        BITMAPINFOHEADER int32 at 18/22, JPEG SOFn segment scan). When
        Pillow is importable it is preferred — identical output, plus
        every format PIL knows. Raises ValueError on an unrecognized
        payload (callers in mapInPandas map that to NULLs, never a job
        failure — same dirty-data contract as
        malformed_json_resilience)."""
        try:  # optional fast path — not installed in this container
            import io

            from PIL import Image  # type: ignore

            with Image.open(io.BytesIO(payload)) as im:
                return im.format or "UNKNOWN", im.width, im.height
        except ImportError:
            pass

        if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
            w, h = struct.unpack(">II", payload[16:24])
            return "PNG", w, h
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            return "GIF", w, h
        if payload[:2] == b"BM" and len(payload) >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            return "BMP", w, abs(h)  # negative height = top-down rows
        if payload[:2] == b"\xff\xd8":  # JPEG: scan segments for SOFn
            i = 2
            while i + 9 <= len(payload):
                if payload[i] != 0xFF:
                    break
                marker = payload[i + 1]
                if (0xC0 <= marker <= 0xCF
                        and marker not in (0xC4, 0xC8, 0xCC)):
                    h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                    return "JPEG", w, h
                seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
                i += 2 + seg_len
            raise ValueError("truncated JPEG: no SOF segment")
        raise ValueError(f"unrecognized image payload: {payload[:4]!r}")

    def encode_bmp(width: int, height: int, seed: bytes = b"") -> bytes:
        """Minimal valid 24-bit BMP encoder (pure Python, public
        spec): 14-byte file header + 40-byte BITMAPINFOHEADER +
        bottom-up pixel rows padded to 4 bytes. Pixels are a
        deterministic function of ``seed`` so payloads are
        reproducible across engines and runs."""
        row_bytes = (width * 3 + 3) & ~3
        pixel_bytes = row_bytes * height
        header = b"BM" + struct.pack(
            "<IHHI", 14 + 40 + pixel_bytes, 0, 0, 14 + 40)
        info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                           pixel_bytes, 2835, 2835, 0, 0)
        pattern = (seed or b"\x00") * (pixel_bytes // max(len(seed), 1)
                                       + 1)
        return header + info + pattern[:pixel_bytes]

    def resize_bmp_half(payload: bytes) -> bytes:
        """Nearest-neighbor 2:1 downsample of a 24-bit BMP, pure
        Python over the raw pixel array (no codec library needed —
        BMP stores pixels uncompressed). Reads the pixel-data offset
        and dimensions from the header, stride-samples every other
        row/column, re-encodes with correct 4-byte row padding.
        Output dims are ``max(d // 2, 1)`` per side."""
        if payload[:2] != b"BM" or len(payload) < 54:
            raise ValueError("not a BMP payload")
        pix_off = struct.unpack("<I", payload[10:14])[0]
        w, h = struct.unpack("<ii", payload[18:26])
        if h < 0:
            # Top-down BMP (negative height): rows are stored first-
            # row-first. This sampler walks rows in bottom-up file
            # order and re-encodes bottom-up — accepting top-down
            # input would silently flip the image vertically, so
            # reject it (``encode_bmp`` only emits bottom-up; this
            # guards external callers — ADVICE r3).
            raise ValueError("top-down BMP (negative height) unsupported")
        src_row = (w * 3 + 3) & ~3
        dst_w, dst_h = max(w // 2, 1), max(h // 2, 1)
        dst_row = (dst_w * 3 + 3) & ~3
        rows = []
        for y in range(dst_h):
            src = pix_off + (y * 2) * src_row
            row = bytearray(dst_row)
            for x in range(dst_w):
                s = src + (x * 2) * 3
                row[x * 3:x * 3 + 3] = payload[s:s + 3]
            rows.append(bytes(row))
        pixel_bytes = dst_row * dst_h
        header = b"BM" + struct.pack(
            "<IHHI", 14 + 40 + pixel_bytes, 0, 0, 14 + 40)
        info = struct.pack("<IiiHHIIiiII", 40, dst_w, dst_h, 1, 24, 0,
                           pixel_bytes, 2835, 2835, 0, 0)
        return header + info + b"".join(rows)

    return decode_image, encode_bmp, resize_bmp_half


decode_image, encode_bmp, resize_bmp_half = _make_codec()


def blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-materialized as a binary payload column (the
    multimodal storage shape), then metadata-extracted via mapInPandas.
    Oracle-checked: byte length, header hex, and sha256 all have exact
    DuckDB twins, proving the Arrow round-trip is lossless.

    The batch fn is a closure, not a module-level def: cloudpickle then
    ships it BY VALUE, so executor Python workers never need this
    package on their PYTHONPATH (true on a real cluster too)."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))

    def blob_meta_batches(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "first4_hex": payloads.map(lambda b: b[:4].hex().upper()),
                "sha256": payloads.map(
                    lambda b: hashlib.sha256(b).hexdigest()),
            })

    return blobs.mapInPandas(blob_meta_batches, BLOB_META_SCHEMA)


BLOB_METADATA_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       hex(encode(substring(text, 1, 4))) AS first4_hex,
       sha256(text) AS sha256
FROM documents
"""


def modality_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The layout-audit query for a multimodal lake: per (source,
    lang) 'modality partition', payload volume and document counts —
    what you'd run before choosing partition/bucket columns at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(F.octet_length(F.encode("text", "UTF-8")))
             .alias("total_bytes"),
             F.max("n_chars").alias("max_chars"))
    )


MODALITY_PARTITION_STATS_SQL = """
SELECT source, lang, count(*) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       max(n_chars) AS max_chars
FROM documents GROUP BY source, lang
"""


FRAME_BYTES = 32      # fake codec: 1 "frame" per 32 payload bytes
MAX_FRAMES = 4        # sample at most 4 frames per payload

FRAME_SAMPLE_SCHEMA = (
    "doc_id bigint, frame_idx bigint, n_frames bigint, frame_sig string")


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (the video path of the multimodal
    contract): each payload is treated as a frame sequence, a strided
    subset of ≤ ``MAX_FRAMES`` frames is sampled, and a per-frame
    feature is extracted — emitted as ONE ROW PER FRAME (the 1:N
    mapInPandas shape a real video pipeline has, vs blob_metadata's
    1:1).

    The codec is the documented deterministic fake (fixed-size frames
    of ``FRAME_BYTES`` bytes, sha256-prefix features) because the
    container ships no libav — ``decode_image`` documents the swap
    point. Everything Spark-side is real: binary Arrow batches in,
    multi-row batches out, embarrassingly parallel per partition, and
    the whole fake is SQL-expressible so even this path is
    oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))

    def frame_batches(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_frames": [],
                   "frame_sig": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(len(payload) // FRAME_BYTES, 1)
                stride = max(n_frames // MAX_FRAMES, 1)
                for f in list(range(0, n_frames, stride))[:MAX_FRAMES]:
                    chunk = payload[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(f)
                    out["n_frames"].append(n_frames)
                    out["frame_sig"].append(
                        hashlib.sha256(chunk).hexdigest()[:16])
            yield _pd.DataFrame(out)

    return blobs.mapInPandas(frame_batches, FRAME_SAMPLE_SCHEMA)


FRAME_SAMPLE_SQL = f"""
WITH meta AS (
    SELECT doc_id, text,
           greatest(octet_length(encode(text)) // {FRAME_BYTES}, 1)
               AS n_frames
    FROM documents
),
strided AS (
    SELECT doc_id, text, n_frames,
           greatest(n_frames // {MAX_FRAMES}, 1) AS stride
    FROM meta
)
SELECT doc_id, f AS frame_idx, n_frames,
       substring(sha256(substring(text, CAST(f * {FRAME_BYTES} + 1 AS INT),
                                  {FRAME_BYTES})), 1, 16) AS frame_sig
FROM strided,
     unnest(list_slice(range(0, n_frames, stride), 1, {MAX_FRAMES}))
         AS u(f)
"""


IMAGE_DECODE_SCHEMA = (
    "doc_id bigint, fmt string, width bigint, height bigint, "
    "n_bytes bigint")


def image_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end image decode over a binary column: each document is
    materialized as a real spec-valid BMP payload (``encode_bmp``,
    dimensions derived from the row), then ``decode_image`` parses the
    container header back out inside an Arrow-batched ``mapInPandas``.

    The oracle recomputes the expected dimensions and exact file size
    arithmetically, so a decoder that misreads the header — or an
    encoder that pads rows wrong — hash-mismatches. This is the
    pipeline shape for 100 TB image curation: binary payload in,
    typed (format, width, height) out, filter on the result."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars")

    def decode_batches(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "fmt": [], "width": [], "height": [],
                   "n_bytes": []}
            for doc_id, text, n_chars in zip(
                    pdf["doc_id"], pdf["text"], pdf["n_chars"]):
                payload = encode_bmp(
                    int(n_chars) % 16 + 1, int(doc_id) % 8 + 1,
                    (text or "x").encode("utf-8")[:8] or b"x")
                try:
                    fmt, w, h = decode_image(payload)
                except ValueError:
                    fmt, w, h = None, None, None
                out["doc_id"].append(doc_id)
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(payload))
            yield _pd.DataFrame(out)

    return docs.mapInPandas(decode_batches, IMAGE_DECODE_SCHEMA)


IMAGE_DECODE_SQL = """
SELECT doc_id,
       'BMP' AS fmt,
       CAST(n_chars % 16 + 1 AS BIGINT) AS width,
       CAST(doc_id % 8 + 1 AS BIGINT) AS height,
       CAST(54 + (((n_chars % 16 + 1) * 3 + 3) // 4) * 4
                * (doc_id % 8 + 1) AS BIGINT) AS n_bytes
FROM documents
"""


IMAGE_RESIZE_SCHEMA = (
    "doc_id bigint, src_w bigint, src_h bigint, dst_w bigint, "
    "dst_h bigint, n_bytes_out bigint")


def image_resize_half(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image resize over a binary column (the 'resize' leg of the
    multimodal contract): encode each row as a spec-valid 24-bit BMP,
    nearest-neighbor 2:1 downsample the raw pixel array
    (``resize_bmp_half`` — BMP is uncompressed, so no codec library is
    needed), and verify by decoding the resized payload's header back.

    The emitted shape metadata is fully determined by the row, so the
    DuckDB oracle recomputes source dims, target dims, and the exact
    padded output byte count arithmetically — a resize that samples
    the wrong stride or pads rows wrong mismatches. Pixel-level
    correctness is pinned by unit test against hand-built bitmaps
    (tests/test_multimodal_decode.py). Arrow-batched mapInPandas,
    embarrassingly parallel, no shuffle."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars")

    def resize_batches(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "src_w": [], "src_h": [], "dst_w": [],
                   "dst_h": [], "n_bytes_out": []}
            for doc_id, text, n_chars in zip(
                    pdf["doc_id"], pdf["text"], pdf["n_chars"]):
                src = encode_bmp(
                    int(n_chars) % 16 + 1, int(doc_id) % 8 + 1,
                    (text or "x").encode("utf-8")[:8] or b"x")
                _, sw, sh = decode_image(src)
                dst = resize_bmp_half(src)
                _, dw, dh = decode_image(dst)
                out["doc_id"].append(doc_id)
                out["src_w"].append(sw)
                out["src_h"].append(sh)
                out["dst_w"].append(dw)
                out["dst_h"].append(dh)
                out["n_bytes_out"].append(len(dst))
            yield _pd.DataFrame(out)

    return docs.mapInPandas(resize_batches, IMAGE_RESIZE_SCHEMA)


IMAGE_RESIZE_SQL = """
WITH dims AS (
    SELECT doc_id,
           n_chars % 16 + 1 AS src_w,
           doc_id % 8 + 1 AS src_h,
           greatest((n_chars % 16 + 1) // 2, 1) AS dst_w,
           greatest((doc_id % 8 + 1) // 2, 1) AS dst_h
    FROM documents
)
SELECT doc_id,
       CAST(src_w AS BIGINT) AS src_w, CAST(src_h AS BIGINT) AS src_h,
       CAST(dst_w AS BIGINT) AS dst_w, CAST(dst_h AS BIGINT) AS dst_h,
       CAST(54 + ((dst_w * 3 + 3) // 4) * 4 * dst_h AS BIGINT)
           AS n_bytes_out
FROM dims
"""


AUDIO_RMS_SCHEMA = (
    "doc_id bigint, win_idx bigint, n_samples bigint, rms_milli bigint")

AUDIO_WIN = 64          # samples per analysis window
AUDIO_MAX_WIN = 3       # emit at most 3 windows per payload


def audio_rms_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction plumbing (the audio leg of the
    multimodal contract): each payload is interpreted as a PCM int16
    mono sample stream — the documented deterministic stand-in for a
    real audio decode, since the container ships no audio codec
    (``decode_image`` documents the same swap point for images) — and
    a per-window RMS loudness feature is computed with numpy over the
    Arrow batch, one row per (payload, window).

    RMS is emitted as integer milli-units (floor) so the value is
    exactly reproducible across engines — the unit test pins it
    against a pure-Python reference, and (oracle-upgraded round 4)
    ``AUDIO_RMS_SQL`` recomputes the whole thing in DuckDB by parsing
    the payload's hex dump into int16-LE samples: the sum of squares
    is integer-exact, so the only float op is one IEEE-correctly-
    rounded sqrt — bit-identical in both engines. 1:N mapInPandas,
    vectorized numpy inside, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))

    def rms_batches(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "win_idx": [], "n_samples": [],
                   "rms_milli": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = payload[:len(payload) & ~1]  # int16 alignment
                samples = _np.frombuffer(buf, dtype="<i2")
                n = len(samples)
                for wi in range(min(
                        max((n + AUDIO_WIN - 1) // AUDIO_WIN, 1),
                        AUDIO_MAX_WIN)):
                    w = samples[wi * AUDIO_WIN:(wi + 1) * AUDIO_WIN]
                    # integer sum of squares (exact — int16² × ≤64
                    # terms fits int64), so the float enters only at
                    # the final sqrt: bit-identical to any reference
                    # regardless of summation order
                    rms = math.sqrt(
                        int((w.astype("i8") ** 2).sum()) / len(w)) \
                        if len(w) else 0.0
                    out["doc_id"].append(doc_id)
                    out["win_idx"].append(wi)
                    out["n_samples"].append(len(w))
                    out["rms_milli"].append(int(rms * 1000))
            yield _pd.DataFrame(out)

    return blobs.mapInPandas(rms_batches, AUDIO_RMS_SCHEMA)


def _audio_rms_sql() -> str:
    """DuckDB twin of audio_rms_windows: byte j of the payload is
    parsed from the hex dump (two nibbles via strpos), sample k =
    little-endian signed int16 from bytes (2k, 2k+1). All sums are
    integer-exact; division/sqrt/floor are IEEE-identical across
    engines."""
    nib = ("(strpos('0123456789abcdef', substr(hx, 4*k + {off}, 1)) - 1)")
    # unsigned 16-bit sample: lo byte = nibbles 1,2; hi byte = 3,4
    v = (f"(({nib.format(off=1)} * 16 + {nib.format(off=2)})"
         f" + 256 * ({nib.format(off=3)} * 16 + {nib.format(off=4)}))")
    return f"""
WITH b AS (
    SELECT doc_id, lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) // 2 AS n
    FROM documents
), w AS (
    SELECT doc_id, hx, n,
           unnest(range(least(greatest((n + {AUDIO_WIN} - 1)
                                       // {AUDIO_WIN}, 1),
                              {AUDIO_MAX_WIN}))) AS win_idx
    FROM b
), s AS (
    SELECT doc_id, win_idx,
           greatest(least({AUDIO_WIN}, n - win_idx * {AUDIO_WIN}),
                    0) AS n_samples,
           list_sum(list_transform(
               list_transform(
                   range(win_idx * {AUDIO_WIN},
                         least(n, (win_idx + 1) * {AUDIO_WIN})),
                   k -> {v}),
               u -> (CASE WHEN u >= 32768 THEN u - 65536 ELSE u END)
                    * (CASE WHEN u >= 32768 THEN u - 65536 ELSE u END)
           )) AS ssum
    FROM w
)
SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx,
       CAST(n_samples AS BIGINT) AS n_samples,
       CASE WHEN n_samples = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(floor(sqrt(CAST(ssum AS DOUBLE) / n_samples)
                            * 1000) AS BIGINT) END AS rms_milli
FROM s
"""


AUDIO_RMS_SQL = _audio_rms_sql()


def blob_metadata_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` twin of ``blob_metadata``: the batch function
    consumes pyarrow RecordBatches directly — no pandas materialization
    between Arrow and user code, which for large binary payloads skips
    one full copy per batch (the fastest Python interop path Spark
    offers). Same output contract, same DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))

    def meta_batches(batches):
        import hashlib

        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            payloads = batch.column(batch.schema.get_field_index("payload"))
            raw = payloads.to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    pc.cast(pc.binary_length(payloads), pa.int32()),
                    pa.array([b[:4].hex().upper() for b in raw],
                             pa.string()),
                    pa.array([hashlib.sha256(b).hexdigest() for b in raw],
                             pa.string()),
                ],
                names=["doc_id", "n_bytes", "first4_hex", "sha256"])

    return blobs.mapInArrow(meta_batches, BLOB_META_SCHEMA)


IMAGE_STATS_SCHEMA = (
    "doc_id bigint, n_pixels bigint, sum_b bigint, sum_g bigint, "
    "sum_r bigint, mean_b double, mean_g double, mean_r double")


def image_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-level feature extraction over a binary image column (the
    'feature-extract' leg of the multimodal contract): decode each
    synthesized 24-bit BMP payload and compute per-channel (B, G, R)
    pixel sums and means — the stats a training pipeline computes for
    normalization constants or brightness/solid-color filters.

    This is the family's strongest oracle: the DuckDB twin re-derives
    every PIXEL VALUE from first principles — ``encode_bmp`` tiles the
    8-byte text seed over the padded pixel array, so byte (x, y, c)
    equals seed[(y·row_bytes + 3x + c) mod L], parsed out of the hex
    dump (the ``audio_rms_windows`` pattern) — and must match the real
    decoder walking real bytes. A decoder that mis-strides rows,
    forgets padding, or swaps channels mismatches immediately. Sums
    are integers (exact); means are exact-int-over-int doubles.

    Scale: Arrow-batched ``mapInPandas``, stateless per batch, no
    shuffle — embarrassingly parallel like the other multimodal legs.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars")

    def stats_batches(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_pixels", "sum_b",
                                   "sum_g", "sum_r", "mean_b",
                                   "mean_g", "mean_r")}
            for doc_id, text, n_chars in zip(
                    pdf["doc_id"], pdf["text"], pdf["n_chars"]):
                payload = encode_bmp(
                    int(n_chars) % 16 + 1, int(doc_id) % 8 + 1,
                    (text or "x").encode("utf-8")[:8] or b"x")
                pix_off = struct.unpack("<I", payload[10:14])[0]
                w, h = struct.unpack("<ii", payload[18:26])
                row_bytes = (w * 3 + 3) & ~3
                sums = [0, 0, 0]
                for y in range(h):
                    base = pix_off + y * row_bytes
                    for x in range(w):
                        for c in range(3):
                            sums[c] += payload[base + x * 3 + c]
                n_px = w * h
                out["doc_id"].append(doc_id)
                out["n_pixels"].append(n_px)
                out["sum_b"].append(sums[0])
                out["sum_g"].append(sums[1])
                out["sum_r"].append(sums[2])
                out["mean_b"].append(sums[0] / n_px)
                out["mean_g"].append(sums[1] / n_px)
                out["mean_r"].append(sums[2] / n_px)
            yield _pd.DataFrame(out)

    return docs.mapInPandas(stats_batches, IMAGE_STATS_SCHEMA)


IMAGE_STATS_SQL = """
WITH dims AS (
    SELECT doc_id,
           n_chars % 16 + 1 AS w,
           doc_id % 8 + 1 AS h,
           ((n_chars % 16 + 1) * 3 + 3) // 4 * 4 AS row_bytes,
           hex(encode(text)) AS hx,
           least(octet_length(encode(text)), 8) AS L
    FROM documents
), px AS (
    SELECT d.doc_id, c.c,
           ('0x' || substr(d.hx,
                CAST(2 * ((y.y * d.row_bytes + x.x * 3 + c.c) % d.L)
                     + 1 AS INT), 2))::INT AS v
    FROM dims d
    CROSS JOIN range(0, 8) y(y)
    CROSS JOIN range(0, 16) x(x)
    CROSS JOIN range(0, 3) c(c)
    WHERE y.y < d.h AND x.x < d.w
)
SELECT doc_id,
       CAST(count(*) // 3 AS BIGINT) AS n_pixels,
       CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_b,
       CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_g,
       CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_r,
       CAST(sum(CASE WHEN c = 0 THEN v END) AS DOUBLE)
           / (count(*) // 3) AS mean_b,
       CAST(sum(CASE WHEN c = 1 THEN v END) AS DOUBLE)
           / (count(*) // 3) AS mean_g,
       CAST(sum(CASE WHEN c = 2 THEN v END) AS DOUBLE)
           / (count(*) // 3) AS mean_r
FROM px GROUP BY doc_id
"""


PHASH_GRID = 8  # fixed comparison grid: 8x8 -> 64-bit hash


def image_phash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup — the multimodal leg of the dedup
    family: average-hash (aHash) each synthesized BMP by
    nearest-neighbor-sampling an 8×8 grayscale grid, thresholding at
    the grid's mean, and packing the 64 bits row-major into a hex
    string; images sharing a hash form a perceptual dup group
    (group_size, keep-min-doc_id canonical — the ``exact_dedup``
    policy applied to PIXELS instead of text). aHash is the classic
    pre-filter in front of byte-exact image dedup: invariant to
    re-encoding, near-invariant to resizing.

    Exactness: every step is integer math — nearest-neighbor indices
    (gx·w)//8, gray = (b+g+r)//3, threshold = floor-mean, bit packing
    — so the DuckDB twin re-derives each sampled PIXEL from the seed
    tiling (the ``image_channel_stats`` oracle pattern) and must
    reproduce the hash bit-for-bit. A decoder that mis-strides,
    mis-rounds the grid mapping, or packs bits in the wrong order
    mismatches immediately.

    Scale: hashing is stateless Arrow-batched ``mapInPandas`` (no
    shuffle); grouping ships 16-char hashes, not images — the
    standard fingerprint-then-group shape at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars")

    def hash_batches(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "phash": []}
            for doc_id, text, n_chars in zip(
                    pdf["doc_id"], pdf["text"], pdf["n_chars"]):
                payload = encode_bmp(
                    int(n_chars) % 16 + 1, int(doc_id) % 8 + 1,
                    (text or "x").encode("utf-8")[:8] or b"x")
                pix_off = struct.unpack("<I", payload[10:14])[0]
                w, h = struct.unpack("<ii", payload[18:26])
                row_bytes = (w * 3 + 3) & ~3
                grays = []
                for gy in range(PHASH_GRID):
                    sy = (gy * h) // PHASH_GRID
                    for gx in range(PHASH_GRID):
                        sx = (gx * w) // PHASH_GRID
                        base = pix_off + sy * row_bytes + sx * 3
                        grays.append((payload[base] + payload[base + 1]
                                      + payload[base + 2]) // 3)
                mean = sum(grays) // (PHASH_GRID * PHASH_GRID)
                val = 0
                for g in grays:
                    val = (val << 1) | (1 if g > mean else 0)
                out["doc_id"].append(doc_id)
                out["phash"].append(format(val, "016x"))
            yield _pd.DataFrame(out)

    from pyspark.sql import Window

    hashed = docs.mapInPandas(hash_batches, "doc_id bigint, phash string")
    wg = Window.partitionBy("phash")
    return hashed.select(
        "doc_id", "phash",
        F.count(F.lit(1)).over(wg).cast("bigint").alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(wg))
        .cast("int").cast("bigint").alias("is_canonical"))


def _phash_byte_sql(c: int) -> str:
    return ("('0x' || substr(d.hx, CAST(2 * (((gy.gy * d.h // 8)"
            " * d.row_bytes + (gx.gx * d.w // 8) * 3 + {c}) % d.L)"
            " + 1 AS INT), 2))::INT").format(c=c)


IMAGE_PHASH_SQL = f"""
WITH dims AS (
    SELECT doc_id,
           n_chars % 16 + 1 AS w,
           doc_id % 8 + 1 AS h,
           ((n_chars % 16 + 1) * 3 + 3) // 4 * 4 AS row_bytes,
           hex(encode(text)) AS hx,
           least(octet_length(encode(text)), 8) AS L
    FROM documents
), g AS (
    SELECT d.doc_id, gy.gy, gx.gx,
           ({_phash_byte_sql(0)}
            + {_phash_byte_sql(1)}
            + {_phash_byte_sql(2)}) // 3 AS gray
    FROM dims d
    CROSS JOIN range(0, {PHASH_GRID}) gy(gy)
    CROSS JOIN range(0, {PHASH_GRID}) gx(gx)
), m AS (
    SELECT doc_id, sum(gray) // {PHASH_GRID * PHASH_GRID} AS mg
    FROM g GROUP BY doc_id
), bits AS (
    SELECT g.doc_id, gy * {PHASH_GRID} + gx AS p,
           CASE WHEN gray > mg THEN 1 ELSE 0 END AS b
    FROM g JOIN m USING (doc_id)
), nibbles AS (
    SELECT doc_id, p // 4 AS n,
           sum(b * (8 >> (p % 4))) AS val
    FROM bits GROUP BY doc_id, p // 4
), ph AS (
    SELECT doc_id,
           string_agg(substr('0123456789abcdef',
                             CAST(val + 1 AS INT), 1), ''
                      ORDER BY n) AS phash
    FROM nibbles GROUP BY doc_id
)
SELECT doc_id, phash,
       CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS group_size,
       CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY phash)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
FROM ph
"""


SILENCE_THRESH = 16384  # |sample| below this = low-energy
SILENCE_MIN_RUN = 2     # minimum consecutive silent samples to report


def audio_silence_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-segment detection over the PCM int16 stream — the
    trimming pass every audio-training pipeline runs before feature
    extraction (cut leading/trailing/internal dead air): maximal runs
    of ≥ ``SILENCE_MIN_RUN`` consecutive samples with
    ``|s| < SILENCE_THRESH``, one row per run with its start offset
    and length plus a per-doc run ordinal. The classic
    gaps-and-islands analytic applied to signal data.

    Exactness: sample parsing and the run/threshold logic are all
    integer ops; the DuckDB twin re-parses every int16-LE sample from
    the payload hex dump (the ``audio_rms_windows`` contract) and
    replays the islands with k − row_number().

    Scale: decode + run detection are stateless per payload inside
    Arrow-batched ``mapInPandas`` — a payload's runs never span
    batches, so no shuffle at any corpus size; output is run
    manifests, not samples.
    """
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))

    def run_batches(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "run_idx": [], "start_sample": [],
                   "run_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = payload[:len(payload) & ~1]
                samples = _np.frombuffer(buf, dtype="<i2").astype(int)
                silent = _np.abs(samples) < SILENCE_THRESH
                runs = []
                start = None
                for k, s in enumerate(silent.tolist() + [False]):
                    if s and start is None:
                        start = k
                    elif not s and start is not None:
                        if k - start >= SILENCE_MIN_RUN:
                            runs.append((start, k - start))
                        start = None
                for idx, (st, ln) in enumerate(runs, start=1):
                    out["doc_id"].append(doc_id)
                    out["run_idx"].append(idx)
                    out["start_sample"].append(st)
                    out["run_len"].append(ln)
            yield _pd.DataFrame(out)

    return blobs.mapInPandas(
        run_batches,
        "doc_id bigint, run_idx bigint, start_sample bigint, "
        "run_len bigint")


def _audio_silence_sql() -> str:
    nib = ("(strpos('0123456789abcdef', substr(hx, 4*k + {off}, 1)) - 1)")
    v = (f"(({nib.format(off=1)} * 16 + {nib.format(off=2)})"
         f" + 256 * ({nib.format(off=3)} * 16 + {nib.format(off=4)}))")
    return f"""
WITH b AS (
    SELECT doc_id, lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) // 2 AS n
    FROM documents
), samp AS (
    SELECT doc_id,
           unnest(list_transform(range(n),
                  k -> struct_pack(k := k, u := {v})),
                  recursive := true)
    FROM b
), signed AS (
    SELECT doc_id, k,
           CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
    FROM samp
), isl AS (
    SELECT doc_id, k,
           k - row_number() OVER (PARTITION BY doc_id ORDER BY k) AS grp
    FROM signed WHERE abs(s) < {SILENCE_THRESH}
), runs AS (
    SELECT doc_id, CAST(min(k) AS BIGINT) AS start_sample,
           count(*) AS run_len
    FROM isl GROUP BY doc_id, grp
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY start_sample) AS BIGINT)
           AS run_idx,
       start_sample, run_len
FROM runs WHERE run_len >= {SILENCE_MIN_RUN}
"""


AUDIO_SILENCE_SQL = _audio_silence_sql()


SHOT_DELTA_THRESH = 160  # |intensity delta| >= this = shot boundary


def frame_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection — the video-analysis step after
    ``frame_sample``'s strided decode: per frame, an intensity
    feature (byte sum over the frame's ``FRAME_BYTES`` chunk), the
    absolute delta to the previous frame, and a boundary flag where
    the delta reaches ``SHOT_DELTA_THRESH`` — the classic
    frame-difference cut detector every video-curation pipeline runs
    to segment clips before sampling training frames. One row per
    frame (the ``frame_sample`` 1:N shape), frame 0 unflagged (no
    predecessor; delta NULL).

    Exactness: intensities and deltas are pure integer sums over
    payload bytes, so the DuckDB twin re-derives every byte from the
    hex dump (the ``audio_rms_windows`` parse) and matches exactly.

    Scale: all frames of a payload live in one Arrow batch row, so
    the delta needs no window shuffle — the detector is stateless per
    payload and embarrassingly parallel; output is frame manifests.
    """
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))

    def shot_batches(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "intensity": [],
                   "delta": [], "is_boundary": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(len(payload) // FRAME_BYTES, 1)
                prev = None
                for f in range(n_frames):
                    chunk = payload[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
                    inten = sum(chunk)
                    delta = None if prev is None else abs(inten - prev)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(f)
                    out["intensity"].append(inten)
                    out["delta"].append(delta)
                    out["is_boundary"].append(
                        1 if delta is not None
                        and delta >= SHOT_DELTA_THRESH else 0)
                    prev = inten
            yield _pd.DataFrame(out)

    return blobs.mapInPandas(
        shot_batches,
        "doc_id bigint, frame_idx bigint, intensity bigint, "
        "delta bigint, is_boundary bigint")


def _shot_boundaries_sql() -> str:
    nib = ("(strpos('0123456789abcdef', substr(hx, 2*j + {off}, 1)) - 1)")
    byte = f"({nib.format(off=1)} * 16 + {nib.format(off=2)})"
    return f"""
WITH b AS (
    SELECT doc_id, lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) AS nbytes
    FROM documents
), fr AS (
    SELECT doc_id, hx, nbytes,
           unnest(range(greatest(nbytes // {FRAME_BYTES}, 1)))
               AS frame_idx
    FROM b
), inten AS (
    SELECT doc_id, frame_idx,
           list_sum(list_transform(
               range(frame_idx * {FRAME_BYTES},
                     least(nbytes, (frame_idx + 1) * {FRAME_BYTES})),
               j -> {byte})) AS intensity
    FROM fr
), d AS (
    SELECT doc_id, frame_idx,
           CAST(intensity AS BIGINT) AS intensity,
           abs(intensity - lag(intensity) OVER (
               PARTITION BY doc_id ORDER BY frame_idx)) AS delta
    FROM inten
)
SELECT doc_id, frame_idx, intensity,
       CAST(delta AS BIGINT) AS delta,
       CAST(CASE WHEN delta >= {SHOT_DELTA_THRESH}
                 THEN 1 ELSE 0 END AS BIGINT) AS is_boundary
FROM d
"""


SHOT_BOUNDARIES_SQL = _shot_boundaries_sql()


ASPECT_BATCH = 32


def aspect_ratio_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing for batched vision training — the
    scheduling step diffusion/vision pipelines run so every batch
    holds same-shape images (NovelAI's SDXL recipe): classify each
    image into one of five aspect classes by EXACT integer
    cross-multiplication (w·2 ≤ h is 'tall', ... , w > 2·h is
    'wide' — no float ratios anywhere near a bucket boundary), then
    report per bucket the batch count at capacity 32 and the padding
    waste the final partial batch costs.

    Image dims follow the corpus's multimodal convention
    (``image_decode_meta``): width = n_chars % 16 + 1,
    height = doc_id % 8 + 1 — the metadata a real pipeline would read
    from ``image_decode_meta``'s output instead.

    Exactness: bucket assignment, batch counts (ceil via integer
    (n + 31) div 32) and max_pixels are all integers; mean aspect is
    a decimal-pinned per-row ratio sum with one final division;
    pad_frac is one double division of exact ints.

    Scale: per-row expressions + one 5-row combinable aggregation —
    the bucket quotas then drive a writer's repartition, which is the
    only shuffle the real pipeline pays.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.col("n_chars") % 16 + 1
    h = F.col("doc_id") % 8 + 1
    bucket = (F.when(w * 2 <= h, "tall")
              .when(w < h, "portrait")
              .when(w == h, "square")
              .when(w <= h * 2, "landscape")
              .otherwise("wide"))
    per_img = docs.select(
        bucket.alias("bucket"),
        (w * h).alias("pixels"),
        F.round(w / h.cast("double"), 10).cast("decimal(25,10)")
        .alias("aspect_dec"))
    n = F.count(F.lit(1))
    n_batches = F.expr(f"(count(1) + {ASPECT_BATCH - 1}) "
                       f"div {ASPECT_BATCH}")
    return (per_img.groupBy("bucket")
            .agg(n.alias("n_images"),
                 n_batches.cast("bigint").alias("n_batches"),
                 F.round(
                     (n_batches * ASPECT_BATCH - n)
                     / (n_batches * ASPECT_BATCH).cast("double"), 10)
                 .alias("pad_frac"),
                 F.max("pixels").cast("bigint").alias("max_pixels"),
                 F.round(F.sum("aspect_dec").cast("double")
                         / n, 10).alias("mean_aspect")))


ASPECT_BUCKETING_SQL = f"""
WITH per_img AS (
    SELECT CASE
             WHEN (n_chars % 16 + 1) * 2 <= (doc_id % 8 + 1) THEN 'tall'
             WHEN (n_chars % 16 + 1) < (doc_id % 8 + 1) THEN 'portrait'
             WHEN (n_chars % 16 + 1) = (doc_id % 8 + 1) THEN 'square'
             WHEN (n_chars % 16 + 1) <= (doc_id % 8 + 1) * 2
                 THEN 'landscape'
             ELSE 'wide'
           END AS bucket,
           (n_chars % 16 + 1) * (doc_id % 8 + 1) AS pixels,
           CAST(round((n_chars % 16 + 1)
                      / CAST(doc_id % 8 + 1 AS DOUBLE), 10)
                AS DECIMAL(25,10)) AS aspect_dec
    FROM documents
)
SELECT bucket, count(*) AS n_images,
       CAST((count(*) + {ASPECT_BATCH - 1}) // {ASPECT_BATCH}
            AS BIGINT) AS n_batches,
       round(((count(*) + {ASPECT_BATCH - 1}) // {ASPECT_BATCH}
              * {ASPECT_BATCH} - count(*))
             / CAST((count(*) + {ASPECT_BATCH - 1}) // {ASPECT_BATCH}
                    * {ASPECT_BATCH} AS DOUBLE), 10) AS pad_frac,
       CAST(max(pixels) AS BIGINT) AS max_pixels,
       round(CAST(sum(aspect_dec) AS DOUBLE) / count(*), 10)
           AS mean_aspect
FROM per_img GROUP BY bucket
"""


CAPTION_W = 8  # caption window: tokens [k, k+W) around the aligned token


def keyframe_caption_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-keyframe ↔ caption-text JOINT operator — the multimodal
    alignment step a video-pretraining pipeline runs after shot
    segmentation: select each clip's keyframes (frame 0 plus every
    ``frame_shot_boundaries`` cut), map each keyframe's byte position
    back to the caption token whose UTF-8 byte span contains it, and
    emit the ``CAPTION_W``-token caption window starting there — the
    (frame, text-snippet) training pairs contrastive video-text models
    consume. Documents play the clips under the module's convention:
    payload = encode(text), 1 frame per ``FRAME_BYTES`` bytes; the
    caption is the document's own token stream, so the alignment is
    byte-faithful rather than synthetic.

    Everything is exact integer/byte arithmetic: frame intensities and
    deltas are byte sums (the ``frame_shot_boundaries`` detector);
    token spans are cumulative ``octet_length(token) + 1`` offsets
    (UTF-8-correct for multi-byte scripts — char offsets would
    misalign zh); every keyframe byte position lands in exactly one
    span because the spans tile [0, nbytes]. The DuckDB twin
    re-derives all of it — bytes from the hex dump, spans from
    string_split — and matches exactly.

    Scale: single mapInPandas pass (the module's declared Python demo
    class) — frames, spans and the alignment all live inside one
    payload's batch row, so the operator is stateless per document,
    zero-shuffle, and embarrassingly parallel; output is bounded by
    keyframes per clip (cuts + 1), not frames × tokens — the naive
    relational form would pay a per-doc frames×tokens range join.
    """
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("doc_id", "text",
                      F.encode("text", "UTF-8").alias("payload"))

    def align_batches(
            batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "byte_pos": [],
                   "intensity": [], "token_idx": [], "caption": []}
            for doc_id, text, payload in zip(
                    pdf["doc_id"], pdf["text"], pdf["payload"]):
                n_frames = max(len(payload) // FRAME_BYTES, 1)
                keyframes = []          # (frame_idx, intensity)
                prev = None
                for f in range(n_frames):
                    chunk = payload[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
                    inten = sum(chunk)
                    if f == 0 or (prev is not None
                                  and abs(inten - prev)
                                  >= SHOT_DELTA_THRESH):
                        keyframes.append((f, inten))
                    prev = inten
                tokens = text.split(" ")
                # spans[k] = first byte of token k; trailing space
                # attaches to its token so spans tile [0, nbytes]
                spans = [0]
                for tok in tokens:
                    spans.append(spans[-1]
                                 + len(tok.encode("utf-8")) + 1)
                k = 0
                for f, inten in keyframes:   # frames ascend, spans too
                    pos = f * FRAME_BYTES
                    while spans[k + 1] <= pos:
                        k += 1
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(f)
                    out["byte_pos"].append(pos)
                    out["intensity"].append(inten)
                    out["token_idx"].append(k)
                    out["caption"].append(
                        " ".join(tokens[k:k + CAPTION_W]))
            yield _pd.DataFrame(out)

    return src.mapInPandas(
        align_batches,
        "doc_id bigint, frame_idx bigint, byte_pos bigint, "
        "intensity bigint, token_idx bigint, caption string")


def _keyframe_caption_sql() -> str:
    nib = ("(strpos('0123456789abcdef', substr(hx, 2*j + {off}, 1)) - 1)")
    byte = f"({nib.format(off=1)} * 16 + {nib.format(off=2)})"
    return f"""
WITH b AS (
    SELECT doc_id, text, lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) AS nbytes
    FROM documents
), fr AS (
    SELECT doc_id, text, hx, nbytes,
           unnest(range(greatest(nbytes // {FRAME_BYTES}, 1)))
               AS frame_idx
    FROM b
), inten AS (
    SELECT doc_id, text, frame_idx,
           -- coalesce: list_sum over an empty range is NULL in DuckDB
           -- while the Spark/Python side sums to 0 (only reachable on a
           -- zero-length payload; pinned same-total anyway — r9 ADVICE)
           CAST(coalesce(list_sum(list_transform(
               range(frame_idx * {FRAME_BYTES},
                     least(nbytes, (frame_idx + 1) * {FRAME_BYTES})),
               j -> {byte})), 0) AS BIGINT) AS intensity
    FROM fr
), kf AS (
    SELECT doc_id, text, frame_idx, intensity,
           frame_idx * {FRAME_BYTES} AS byte_pos
    FROM (
        SELECT *, abs(intensity - lag(intensity) OVER (
                   PARTITION BY doc_id ORDER BY frame_idx)) AS delta
        FROM inten
    )
    WHERE frame_idx = 0 OR delta >= {SHOT_DELTA_THRESH}
), toks AS (
    SELECT doc_id, string_split(text, ' ') AS tl FROM b
), spans AS (
    SELECT doc_id, k - 1 AS token_idx,
           sum(octet_length(encode(tl[k])) + 1)
               OVER (PARTITION BY doc_id ORDER BY k
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING) AS off_start,
           sum(octet_length(encode(tl[k])) + 1)
               OVER (PARTITION BY doc_id ORDER BY k) AS off_end
    FROM (SELECT doc_id, tl,
                 unnest(range(1, len(tl) + 1)) AS k
          FROM toks)
)
SELECT kf.doc_id, kf.frame_idx, kf.byte_pos, kf.intensity,
       CAST(s.token_idx AS BIGINT) AS token_idx,
       array_to_string(list_slice(t.tl, s.token_idx + 1,
                                  s.token_idx + {CAPTION_W}), ' ')
           AS caption
FROM kf
JOIN spans s ON s.doc_id = kf.doc_id
            AND coalesce(s.off_start, 0) <= kf.byte_pos
            AND kf.byte_pos < s.off_end
JOIN toks t ON t.doc_id = kf.doc_id
"""


KEYFRAME_CAPTION_SQL = _keyframe_caption_sql()


# --- audio-fingerprint retrieval (round 10) --------------------------------
# Landmark parameters. A fingerprint is built from each CONSECUTIVE pair
# of full AUDIO_WIN-sample analysis windows (the audio_rms_windows PCM
# convention): fp = band(peak_1) · 2^9  +  band(peak_2) · 2^4  +
# Δpos/4, where band(v) = (v + 32768) >> FP_BAND_SHIFT quantizes the
# int16 peak into 32 energy bands and Δpos is the peak-position offset
# modulo AUDIO_WIN — the Shazam-style (anchor, target, time-delta)
# landmark hash, all-integer so both engines agree bit-exactly.
FP_MAX_WIN = 4       # fingerprint at most the first 4 full windows
FP_BAND_SHIFT = 11   # peak band = (pv + 32768) >> 11 ∈ [0, 32)
FP_DPOS_SHIFT = 2    # Δpos bucket = ((pp2-pp1) mod WIN) >> 2 ∈ [0, 16)
N_AUDIO_QUERIES = 8  # doc_id < 8 form the query clip set
FP_TOP_K = 5         # matches reported per query clip


def audio_fingerprint_retrieval(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Cross-modal retrieval by AUDIO fingerprint — the second half of
    the multimodal alignment pair (``keyframe_caption_align`` aligns
    video keyframes to caption text; this aligns audio clips to the
    documents that contain matching audio): each payload is read as the
    module's PCM int16-LE stream (``audio_rms_windows`` convention),
    per-window peak landmarks are hashed into Shazam-style
    (band₁, band₂, Δpos) fingerprints, and query clips (doc_id <
    ``N_AUDIO_QUERIES``) retrieve their top-``FP_TOP_K`` matching
    documents by shared-fingerprint count — the audio-dedup /
    find-the-source primitive a multimodal curation pipeline runs
    before pairing transcripts with clips.

    Everything is exact integer arithmetic: samples are parsed from the
    payload's hex dump with pure JVM expressions (``conv`` on two-nibble
    substrings — deliberately NO Python in this plan, demonstrating
    that even the byte-level feature extraction the mapInPandas demos
    do in numpy can stay JVM-side), peaks tie-break to the FIRST
    position (struct ``array_max`` over (value, −index) — one pass per
    window), and the landmark hash packs three small non-negative
    integers, so the DuckDB twin (same hex-nibble parse;
    ``list_position`` on the max has identical first-match semantics)
    matches bit-for-bit.

    Scale: extraction is per-row expression work at scan speed (zero
    shuffle); the fingerprint relation is lineage-cut ONCE because it
    feeds both join sides (the simhash/band-join discipline); matching
    is an equi-join on the fingerprint value — the inverted-index
    retrieval shape, never all-pairs — with the bounded query side
    (≤ N_AUDIO_QUERIES · (FP_MAX_WIN−1) rows) broadcast, so the
    corpus never shuffles for the join; scoring is one combinable
    aggregation and the top-k window partitions by query clip. At
    100 TB the fingerprint posting lists are the sharding unit, exactly
    like the flagship inverted index (mapreduce.c:117's one exchange).
    """
    from pyspark.sql import Window

    from ..functions.lineage import truncate_lineage

    docs = load_table(spark, sf_dir, "documents")
    pay = F.encode("text", "UTF-8")
    hx = F.lower(F.hex(pay))
    n_win = F.least(F.shiftright(F.shiftright(F.length(pay), 1),
                                 6),  # full 64-sample windows only
                    F.lit(FP_MAX_WIN))

    def sample(k: F.Column) -> F.Column:
        """int16-LE sample k from ONE 4-hex-char substring: conv parses
        the two bytes big-endian (lo·256 + hi), an integer byte-swap
        restores little-endian, then sign. One substring + one conv —
        interpreted-expression cost is per-operator-node, so halving
        the string ops halves the hot loop."""
        be = F.conv(F.substring(hx, k * 4 + 1, 4), 16, 10).cast("long")
        u = F.shiftright(be, 8) + F.shiftleft(be % 256, 8)
        return F.when(u >= 32768, u - 65536).otherwise(u)

    def peak(w: F.Column) -> F.Column:
        """ONE pass per window: argmax folded into a struct array_max —
        max by (value, w·WIN − k), so ties break to the SMALLEST k
        (first max). A separate ``array_position`` lookup would make
        Catalyst re-evaluate the whole 64-sample parse per reference
        (higher-order expressions are interpreted and never CSE'd —
        the first cut of this operator did exactly that and ranked as
        the fleet's slowest query, 204 s at sf0.1)."""
        return F.array_max(F.transform(
            F.sequence(w * AUDIO_WIN, w * AUDIO_WIN + AUDIO_WIN - 1),
            lambda k: F.struct(sample(k).alias("pv"),
                               (w * AUDIO_WIN - k).alias("nk"))))

    # empty-safe windows (functions/tokens.py pattern): slice of a
    # CONSTANT ascending sequence — no descending-sequence hazard
    peaks = F.transform(
        F.slice(F.sequence(F.lit(0), F.lit(FP_MAX_WIN - 1)), 1, n_win),
        peak)
    # posexplode is a GENERATOR: `peaks` (the whole 256-sample parse)
    # is evaluated exactly ONCE per document — an array zip_with of
    # two slices would evaluate it once per slice reference (no CSE
    # across higher-order lambdas; measured 2× = 28 s at sf0.1).
    # Consecutive-window pairing then rides a lead() window over the
    # tiny (doc, window, peak) relation — the oracle's own shape.
    # The docs relation is round-robin repartitioned first: the
    # single-file documents table scans as 1-2 partitions regardless
    # of core count, which would serialize the interpreted per-row
    # parse on one core (the round-9 RDD-reduce / quantizer `_coded`
    # hazard class — measured 14 s single-task vs ~1 s spread).
    par = spark.sparkContext.defaultParallelism
    win_rows = docs.repartition(par).select(
        "doc_id", F.posexplode(peaks).alias("w", "pk"))
    wspec = Window.partitionBy("doc_id").orderBy("w")
    nxt = F.lead("pk").over(wspec)
    fp = (F.shiftright(F.col("pk")["pv"] + 32768, FP_BAND_SHIFT) * 512
          + F.shiftright(nxt["pv"] + 32768, FP_BAND_SHIFT) * 16
          # pp = −nk, so Δpos = pp₂ − pp₁ = nk₁ − nk₂
          + F.shiftright((F.col("pk")["nk"] - nxt["nk"] + AUDIO_WIN)
                         % AUDIO_WIN, FP_DPOS_SHIFT))
    rel = truncate_lineage(
        win_rows.select("doc_id", fp.alias("fp"))
        .filter(F.col("fp").isNotNull()).distinct())
    queries = (rel.filter(F.col("doc_id") < N_AUDIO_QUERIES)
               .select(F.col("doc_id").alias("q_doc"),
                       F.col("fp").alias("qfp")))
    scored = (rel.join(F.broadcast(queries), F.col("fp") == F.col("qfp"))
              .filter(F.col("doc_id") != F.col("q_doc"))
              .groupBy("q_doc", "doc_id")
              .agg(F.count("*").alias("shared_fps")))
    w = Window.partitionBy("q_doc").orderBy(
        F.desc("shared_fps"), F.asc("doc_id"))
    return (scored.withColumn(
        "rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= FP_TOP_K)
        .select("q_doc", F.col("doc_id").alias("match_doc"),
                "rank", "shared_fps"))


def _audio_fingerprint_sql() -> str:
    """DuckDB twin: identical hex-nibble int16-LE parse as
    ``_audio_rms_sql``, ``list_position`` = first-match like Spark's
    ``array_position``, and the same all-integer landmark packing."""
    nib = ("(strpos('0123456789abcdef', substr(hx, 4*k + {off}, 1)) - 1)")
    u = (f"(({nib.format(off=1)} * 16 + {nib.format(off=2)})"
         f" + 256 * ({nib.format(off=3)} * 16 + {nib.format(off=4)}))")
    return f"""
WITH b AS (
    SELECT doc_id, lower(hex(encode(text))) AS hx,
           octet_length(encode(text)) // 2 AS n
    FROM documents
), w AS (
    SELECT doc_id, hx,
           unnest(range(least(n // {AUDIO_WIN}, {FP_MAX_WIN}))) AS w
    FROM b
), vals AS (
    SELECT doc_id, w,
           list_transform(range(w * {AUDIO_WIN}, (w + 1) * {AUDIO_WIN}),
               k -> CASE WHEN {u} >= 32768 THEN {u} - 65536
                         ELSE {u} END) AS vs
    FROM w
), pk AS (
    SELECT doc_id, w, list_max(vs) AS pv,
           list_position(vs, list_max(vs)) - 1 AS pp
    FROM vals
), pr AS (
    SELECT doc_id, pv, pp,
           lead(pv) OVER (PARTITION BY doc_id ORDER BY w) AS pv2,
           lead(pp) OVER (PARTITION BY doc_id ORDER BY w) AS pp2
    FROM pk
), fp AS (
    SELECT DISTINCT doc_id,
           ((pv + 32768) // {1 << FP_BAND_SHIFT}) * 512
           + ((pv2 + 32768) // {1 << FP_BAND_SHIFT}) * 16
           + (((pp2 - pp + {AUDIO_WIN}) % {AUDIO_WIN})
              // {1 << FP_DPOS_SHIFT}) AS fp
    FROM pr WHERE pv2 IS NOT NULL
), scored AS (
    SELECT q.doc_id AS q_doc, c.doc_id AS match_doc,
           count(*) AS shared_fps
    FROM fp q JOIN fp c ON c.fp = q.fp AND c.doc_id <> q.doc_id
    WHERE q.doc_id < {N_AUDIO_QUERIES}
    GROUP BY 1, 2
)
SELECT q_doc, match_doc, CAST(rank AS BIGINT) AS rank,
       CAST(shared_fps AS BIGINT) AS shared_fps
FROM (
    SELECT *, row_number() OVER (PARTITION BY q_doc
               ORDER BY shared_fps DESC, match_doc) AS rank
    FROM scored
) WHERE rank <= {FP_TOP_K}
"""


AUDIO_FINGERPRINT_SQL = _audio_fingerprint_sql()
