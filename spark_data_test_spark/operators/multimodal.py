"""Multimodal column support (north-star).

Media (image/audio/video) are opaque ``binary`` columns with a typed
metadata struct riding alongside. The Spark-side plumbing — schema,
partitioning, Arrow batch shape, ``mapInPandas`` signatures — is real
and tested; the actual media decoders are STUBBED (this environment has
no image/audio libraries): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless PIL/soundfile import, and the pipeline
runs a deterministic fake feature extractor instead, so the distributed
path is exercised end-to-end.

The testdata has no media table, so the binary corpus is derived by
UTF-8-encoding ``documents.text`` — byte-level semantics (lengths,
hashes, slicing) are identical to a real blob column.
"""

import hashlib

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from spark_data_test_spark.operators.relational import query, t

try:  # pragma: no cover - decoder libs absent in this environment
    from PIL import Image  # noqa: F401

    _PIL_AVAILABLE = True
except ImportError:
    _PIL_AVAILABLE = False


def decode_image(content: bytes):
    """Real image decode — requires PIL, stubbed here."""
    if not _PIL_AVAILABLE:
        raise NotImplementedError(
            "image decoding requires PIL; this environment runs the "
            "deterministic fake extractor instead (fake_features)"
        )
    raise NotImplementedError("wire PIL decode here when available")


def fake_features(content: bytes):
    """Deterministic stand-in for decode: md5-derived pseudo-dimensions.

    Matches the SQL expression ``ascii(substr(md5(x), k, 1))`` so the
    whole Arrow/pandas path is oracle-checkable.
    """
    digest = hashlib.md5(content).hexdigest()
    return len(content), ord(digest[0]), ord(digest[1])


def to_binary_table(spark, sf_dir):
    """documents -> (doc_id, content binary, meta struct).

    The metadata struct (mime, n_bytes, source) is the pattern for real
    media lakes: filterable typed fields next to the opaque payload, so
    partition/predicate pruning works without touching bytes.
    """
    d = t(spark, sf_dir, "documents")
    content = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        content.alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col("text")).alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
    ]
)


def decode_features(binary_df):
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each partition arrives as an iterator of pandas
    batches (columnar Arrow transfer, no per-row pickling); emits one
    feature row per blob. Swap ``fake_features`` for a real decoder when
    libraries exist — the plan shape (scan -> Arrow -> Python -> Arrow)
    is unchanged.
    """

    def extract(batches):
        for pdf in batches:
            feats = [fake_features(content) for content in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [f[0] for f in feats],
                    "fake_width": [f[1] for f in feats],
                    "fake_height": [f[2] for f in feats],
                }
            )

    return binary_df.select("doc_id", "content").mapInPandas(
        extract, schema=_FEATURE_SCHEMA
    )


def frame_sample(binary_df, frame_bytes=64, stride=4):
    """"Video" frame sampling on the JVM side: slice the blob into
    fixed-size frames and keep every ``stride``-th one — posexplode of a
    computed offset sequence; no Python involved, so this scales as a
    pure narrow transform."""
    n = F.octet_length(F.col("content"))
    offsets = F.expr(
        f"filter(sequence(1, greatest(octet_length(content) - {frame_bytes - 1}, 1),"
        f" {frame_bytes}), (x, i) -> i % {stride} = 0)"
    )
    return binary_df.where(n >= frame_bytes).select(
        "doc_id",
        F.posexplode(offsets).alias("frame_no", "offset"),
        F.expr(f"substring(content, offset, {frame_bytes})").alias("frame"),
    ).select("doc_id", "frame_no", "offset", "frame")


@query(
    "multimodal_binary_features",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substr(hex(encode(text)), 1, 16) AS head_hex
    FROM documents
    """,
)
def multimodal_binary_features(spark, sf_dir):
    """JVM-side blob features: byte length + hex prefix of the payload
    (no Python, codegen-friendly)."""
    b = to_binary_table(spark, sf_dir)
    return b.select(
        "doc_id",
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
        F.substring(F.hex(F.col("content")), 1, 16).alias("head_hex"),
    )


@query(
    "multimodal_decode_stub",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(ascii(substr(md5(text), 1, 1)) AS INTEGER) AS fake_width,
           CAST(ascii(substr(md5(text), 2, 1)) AS INTEGER) AS fake_height
    FROM documents
    """,
)
def multimodal_decode_stub(spark, sf_dir):
    """The full distributed decode path: binary table -> mapInPandas
    (Arrow batches) -> deterministic fake features, oracle-checked
    because Python md5 == SQL md5 over the same bytes."""
    return decode_features(to_binary_table(spark, sf_dir))


_FRAME_BYTES = 64
_FRAME_STRIDE = 4


@query(
    "multimodal_frame_sample",
    f"""
    WITH lens AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents WHERE octet_length(encode(text)) >= {_FRAME_BYTES}),
    counts AS (
      SELECT doc_id, text,
             ((GREATEST(n - {_FRAME_BYTES - 1}, 1) - 1) // {_FRAME_BYTES}) + 1
               AS n_offsets
      FROM lens),
    frames AS (
      SELECT doc_id, text, unnest(generate_series(0, (n_offsets - 1) // {_FRAME_STRIDE})) AS k
      FROM counts)
    SELECT doc_id, CAST(k AS INTEGER) AS frame_no,
           CAST(1 + {_FRAME_BYTES * _FRAME_STRIDE} * k AS BIGINT) AS "offset",
           md5(substr(text, CAST(1 + {_FRAME_BYTES * _FRAME_STRIDE} * k AS INTEGER), {_FRAME_BYTES}))
             AS frame_md5
    FROM frames
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """"Video" frame sampling as a driver query: each blob is sliced
    into fixed {_FRAME_BYTES}-byte frames and every {_FRAME_STRIDE}-th
    frame is kept (`frame_sample` — JVM-side posexplode of a computed
    offset sequence, no Python). Frames are emitted as md5 digests so
    the cross-engine compare works on a portable value; the oracle
    re-derives the same byte slices from the text (the corpus is ASCII,
    so byte offsets equal character offsets — asserted against
    octet_length) and must reproduce every (doc, frame_no, offset,
    digest) tuple.

    Shape at 100 TB: a narrow scan-side transform — filter + explode +
    substring — no shuffle at all before any downstream aggregation;
    exactly how frame extraction fans out of a media lake."""
    b = to_binary_table(spark, sf_dir)
    fs = frame_sample(b, frame_bytes=_FRAME_BYTES, stride=_FRAME_STRIDE)
    return fs.select(
        "doc_id",
        "frame_no",
        F.col("offset").cast("long").alias("offset"),
        F.md5("frame").alias("frame_md5"),
    )


_CHUNK_BYTES = 256


@query(
    "multimodal_chunk_dedup",
    f"""
    WITH chunks AS (
      SELECT doc_id, md5(substr(text, i, {_CHUNK_BYTES})) AS h
      FROM documents,
           unnest(generate_series(1, length(text), {_CHUNK_BYTES})) AS u(i)
      WHERE length(text) >= 1),
    per_chunk AS (
      SELECT h, COUNT(*) AS refs FROM chunks GROUP BY h)
    SELECT CAST(SUM(refs) AS BIGINT) AS total_chunks,
           CAST(COUNT(*) AS BIGINT) AS distinct_chunks,
           CAST(SUM(refs) - COUNT(*) AS BIGINT) AS dedupable_chunks,
           CAST(MAX(refs) AS BIGINT) AS hottest_chunk_refs,
           CAST(COUNT(*) AS DOUBLE) / CAST(SUM(refs) AS DOUBLE)
             AS unique_ratio
    FROM per_chunk
    """,
)
def multimodal_chunk_dedup(spark, sf_dir):
    """Content-addressable-storage dedup report over the binary corpus:
    every blob is cut into fixed chunks (_CHUNK_BYTES = 256 bytes),
    chunks are keyed by digest, and the report says how much of the
    byte volume collapses under chunk-level dedup — the
    fixed-size-chunking CAS model object stores and data lakes use for
    media (a shared intro sequence or boilerplate header dedups at
    chunk granularity even when whole-file hashes differ). The Spark
    side chunks the BINARY column with JVM substring on byte offsets;
    the oracle re-chunks the source text (ASCII corpus: byte offsets ==
    char offsets, the same equivalence multimodal_frame_sample pins),
    so a drift in offset arithmetic or encoding breaks the hash.

    Empty blobs are filtered on BOTH sides: Spark's sequence(1, 0)
    throws on the descending boundary where the oracle's
    generate_series just emits nothing (the same guard the dedup
    shingle explode carries).

    Shape at 100 TB: scan-side explode (no shuffle carries content —
    chunks reduce to 16-byte digests in the same stage), one
    map-side-combinable count per digest, one final fold to the
    driver-small summary row."""
    b = to_binary_table(spark, sf_dir).where(F.length("content") >= 1)
    chunks = b.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(content), {_CHUNK_BYTES}),"
                f" i -> substring(content, i, {_CHUNK_BYTES}))"
            )
        ).alias("chunk"),
    ).select(F.md5("chunk").alias("h"))
    per_chunk = chunks.groupBy("h").agg(F.count(F.lit(1)).alias("refs"))
    return per_chunk.agg(
        F.sum("refs").alias("total_chunks"),
        F.count(F.lit(1)).alias("distinct_chunks"),
        (F.sum("refs") - F.count(F.lit(1))).cast("long").alias("dedupable_chunks"),
        F.max("refs").alias("hottest_chunk_refs"),
        (
            F.count(F.lit(1)).cast("double") / F.sum("refs").cast("double")
        ).alias("unique_ratio"),
    )
