"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas`` (north-star
BASELINE.json 'Multimodal columns').

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (``decode_image`` raises NotImplementedError; the
pipeline uses a deterministic fake header parse instead). Everything
around it — the binary column, the schema contract, the Arrow batch
shape, the partition-parallel UDF execution — is real and tested:
swapping the fake for PIL/libav is a one-function change.

Scale notes: payload bytes travel Spark→Python as Arrow buffers (zero
row-at-a-time serialization); metadata extraction is embarrassingly
parallel per batch; at 100 TB you'd store payloads in parquet binary
columns exactly like this, partitioned by modality/date.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

BLOB_META_SCHEMA = (
    "doc_id bigint, n_bytes int, first4_hex string, sha256 string"
)


def decode_image(payload: bytes):  # pragma: no cover - documented stub
    """REAL image decode (PIL/turbojpeg) — unavailable in this
    container. The plumbing below uses ``_fake_header_meta`` instead;
    swap this in when codecs exist."""
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "use _fake_header_meta for deterministic testing")


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
