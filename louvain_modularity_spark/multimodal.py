"""Multimodal columns (SURVEY.md §2.9 / task brief): image/audio/video
as opaque BINARY payloads + typed metadata, processed through
Arrow-batched ``mapInPandas`` pipelines.

The container has no image/audio codecs, so the decode step is STUBBED
(``NotImplementedError`` behind ``require_codec``) — but everything
Spark-side is real and tested: the payload schema, the mapInPandas
batch shape, deterministic byte-level feature extraction, and frame
sampling over raw bytes. Swapping the stub for PIL/librosa changes one
function, not the plumbing.

Scale notes: payload columns ride along scans untouched (parquet column
pruning skips them unless referenced); feature extraction is an
embarrassingly-parallel mapInPandas with no shuffle; keep
``spark.sql.files.maxPartitionBytes`` modest when payloads are MBs so a
task's Arrow batch fits executor memory.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (resolves pandas_udf/mapInPandas annotations)
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .sources import load

#: metadata carried with every payload (mirrors a typical lakehouse
#: multimodal schema: opaque bytes + mime + size + content fingerprint)
PAYLOAD_SCHEMA = (
    "doc_id LONG, payload BINARY, mime STRING, byte_len INT, fingerprint LONG"
)


def attach_payload(df: DataFrame, mime: str = "application/octet-stream") -> DataFrame:
    """Wrap a text column as an opaque binary payload + typed metadata.

    In production the payload column arrives from parquet as real
    image/audio bytes; here document text stands in as the byte source
    so the pipeline is end-to-end testable.
    """
    payload = F.encode("text", "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.lit(mime).alias("mime"),
        F.length(payload).cast("int").alias("byte_len"),
        F.xxhash64(payload).alias("fingerprint"),
    )


def require_codec(kind: str) -> None:
    """Gate for real decoders; the container ships none."""
    raise NotImplementedError(
        f"no {kind} codec available in this environment — plug a decoder "
        "(e.g. PIL for images, soundfile for audio) into decode_payload()"
    )


def decode_payload(kind: str = "image"):
    """Real decode entry point — intentionally a stub (see module doc)."""
    require_codec(kind)


def extract_features(payloads: DataFrame, n_features: int = 4) -> DataFrame:
    """Deterministic byte-level 'feature extraction' through mapInPandas
    (the stand-in for a neural feature extractor): first-N byte values
    + simple byte statistics, computed per Arrow batch.
    """
    out_schema = "doc_id LONG, byte_len INT, head0 INT, head1 INT, byte_sum LONG"

    def batches(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["payload"].map(len).astype("int32"),
                    "head0": pdf["payload"].map(
                        lambda b: int(b[0]) if len(b) > 0 else -1
                    ),
                    "head1": pdf["payload"].map(
                        lambda b: int(b[1]) if len(b) > 1 else -1
                    ),
                    "byte_sum": pdf["payload"].map(lambda b: int(sum(b))),
                }
            )

    return payloads.mapInPandas(batches, schema=out_schema)


def frame_sample(payloads: DataFrame, frame_size: int = 16, stride: int = 64) -> DataFrame:
    """'Frame sampling' over raw bytes (the video analogue: take a
    frame_size-byte window every stride bytes) — pure DataFrame slice
    arithmetic, no Python in the loop."""
    return payloads.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, greatest(cast(floor((byte_len - {frame_size}) / {stride}) as int), 0)),"
                f" i -> substring(payload, i * {stride} + 1, {frame_size}))"
            )
        ).alias("frame_idx", "frame_bytes"),
    )


# ---------------------------------------------------------------------------
# declared queries
# ---------------------------------------------------------------------------


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload metadata surface: byte length, mime, head-bytes hex —
    values reproducible by the oracle straight from the text."""
    d = load(spark, sf_dir, "documents")
    p = attach_payload(d)
    return p.select(
        "doc_id",
        "mime",
        "byte_len",
        F.upper(F.hex(F.expr("substring(payload, 1, 4)"))).alias("head_hex"),
    )


ORACLE_MULTIMODAL_META = """
SELECT doc_id,
       'application/octet-stream' AS mime,
       CAST(strlen(text) AS INTEGER) AS byte_len,
       upper(hex(substring(text, 1, 4))) AS head_hex
FROM documents
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte features THROUGH the mapInPandas path, verified against a
    pure-SQL oracle — proves the Arrow plumbing computes exactly what
    it should."""
    d = load(spark, sf_dir, "documents")
    return extract_features(attach_payload(d))


# NOTE: this oracle reads *characters* (ascii/substring) while the
# engine reads *bytes* — they agree only because the documents fixture
# is pure 7-bit ASCII (one byte per char), which
# tests/test_llm_ops.py::test_documents_fixture_is_ascii asserts. A
# multi-byte character would break head0/head1/byte_sum parity; the
# empty/1-char edge cases are handled explicitly below so they cannot
# diverge (engine emits -1; DuckDB ascii('') does not).
ORACLE_MULTIMODAL_FEATURES = """
SELECT doc_id,
       CAST(strlen(text) AS INTEGER)                       AS byte_len,
       CAST(CASE WHEN strlen(text) >= 1 THEN ascii(substring(text, 1, 1))
                 ELSE -1 END AS INTEGER)                   AS head0,
       CAST(CASE WHEN strlen(text) >= 2 THEN ascii(substring(text, 2, 1))
                 ELSE -1 END AS INTEGER)                   AS head1,
       CAST(COALESCE(list_sum(list_transform(range(1, strlen(text) + 1),
                     i -> ascii(substring(text, i, 1)))), 0) AS BIGINT) AS byte_sum
FROM documents
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-window frame sampling; count + first-frame hex per doc."""
    d = load(spark, sf_dir, "documents")
    frames = frame_sample(attach_payload(d))
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.upper(F.hex(F.min(F.struct("frame_idx", "frame_bytes"))["frame_bytes"])).alias(
            "first_frame_hex"
        ),
    )


ORACLE_FRAME_SAMPLE = """
SELECT doc_id,
       CAST(greatest(CAST(FLOOR((strlen(text) - 16) / 64) AS INTEGER), 0) + 1 AS BIGINT) AS n_frames,
       upper(hex(substring(text, 1, 16))) AS first_frame_hex
FROM documents
"""


def q_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` surface (the zero-copy Arrow RecordBatch lane,
    one level below mapInPandas — no pandas materialization, the lane
    a real codec/tokenizer binding would use): per-embedding dimension
    count and L2 norm computed batch-wise in Python. The fold is the
    SAME sequential double accumulation as the JVM-side ``_dot``
    (float32→double cast is exact, adds in list order), so the result
    hash-matches the oracle bit-for-bit — demonstrating that the Arrow
    lane need not cost numeric fidelity. Builtins remain the hot path
    for arithmetic like this (q_embedding_normalize is the JVM twin);
    this pins the BATCH SHAPE: schema in/out, iterator contract,
    per-batch zero-copy.

    100 TB: embarrassingly parallel, no shuffle; batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    import math

    import pyarrow as pa

    def norms(batches):
        for b in batches:
            vids = b.column("vec_id")
            dims, l2 = [], []
            for emb in b.column("embedding").to_pylist():
                acc = 0.0
                for v in emb:
                    acc += v * v  # v already exact double (from float32)
                dims.append(len(emb))
                l2.append(math.sqrt(acc))
            yield pa.record_batch(
                [vids, pa.array(dims, pa.int32()), pa.array(l2, pa.float64())],
                names=["vec_id", "n_dims", "l2_norm"],
            )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = emb.mapInArrow(norms, "vec_id LONG, n_dims INT, l2_norm DOUBLE")
    return out.select(
        "vec_id", "n_dims", F.round("l2_norm", 6).alias("l2_norm")
    ).orderBy("vec_id")


ORACLE_ARROW_BATCH = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS n_dims,
       ROUND(SQRT(list_sum(list_transform(embedding,
                  v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))), 6) AS l2_norm
FROM embeddings
ORDER BY vec_id
"""


QUERIES = {
    "q_multimodal_meta": q_multimodal_meta,
    "q_multimodal_features": q_multimodal_features,
    "q_frame_sample": q_frame_sample,
    "q_arrow_batch": q_arrow_batch,
}

ORACLES = {
    "q_arrow_batch": ORACLE_ARROW_BATCH,
    "q_multimodal_meta": ORACLE_MULTIMODAL_META,
    "q_multimodal_features": ORACLE_MULTIMODAL_FEATURES,
    "q_frame_sample": ORACLE_FRAME_SAMPLE,
}
