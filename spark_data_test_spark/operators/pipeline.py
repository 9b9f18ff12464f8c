"""End-to-end training-corpus preparation pipeline (north-star flagship
composition).

One declarative plan chaining the LLM-data stages every large-scale
corpus build runs — quality scoring -> quality filter -> exact dedup ->
token accounting -> deterministic train/val/test split -> per-split
composition stats — over the planted-duplicate corpus. Each stage
reuses the exact arithmetic of its standalone operator
(text.text_quality_score, dedup.dedup_exact, sampling.split_assign), so
the pipeline is the composition proof: Catalyst fuses the whole chain
into scan -> project -> one dedup shuffle -> one stats shuffle, with the
quality filter pushed below the dedup exchange.

100 TB notes: two shuffles total — the content-hash groupBy (dedup) and
the split aggregation (4-row output); everything else is map-side.
Quality is micro-quantized per document (round(q * 1e6) -> bigint) so
the per-split sums are exact integers — order-independent, identical in
both engines — instead of float accumulation order lottery.
"""

import pyspark.sql.functions as F

from spark_data_test_spark.operators.dedup import _EXACT_CORPUS_SQL, _exact_corpus
from spark_data_test_spark.operators.relational import query
from spark_data_test_spark.operators.sampling import _bucket_sql, _hash_bucket

_MIN_QUALITY = 0.5


@query(
    "corpus_prepare_pipeline",
    f"""
    WITH {_EXACT_CORPUS_SQL.strip()},
    scored AS (
      SELECT doc_id, text,
             (length(trim(text)) - length(replace(trim(text), ' ', ''))) + 1 AS n_words,
             least(1.0, CAST((length(trim(text)) - length(replace(trim(text), ' ', ''))) + 1 AS DOUBLE) / 100.0) * 0.5
               + least(1.0, (CAST(length(text) - ((length(trim(text)) - length(replace(trim(text), ' ', ''))) + 1) + 1 AS DOUBLE)
                             / ((length(trim(text)) - length(replace(trim(text), ' ', ''))) + 1)) / 8.0) * 0.5
               AS quality
      FROM corpus),
    kept AS (SELECT * FROM scored WHERE quality >= {_MIN_QUALITY}),
    deduped AS (
      SELECT doc_id, n_words, quality
      FROM (SELECT doc_id, n_words, quality,
                   ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM kept)
      WHERE rn = 1),
    tagged AS (
      SELECT CASE WHEN {_bucket_sql("doc_id")} < 800 THEN 'train'
                  WHEN {_bucket_sql("doc_id")} < 900 THEN 'val'
                  ELSE 'test' END AS split,
             n_words,
             CAST(round(quality * 1000000) AS BIGINT) AS q_1e6
      FROM deduped)
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_tokens,
           CAST(SUM(q_1e6) AS BIGINT) AS sum_quality_1e6
    FROM tagged GROUP BY split
    """,
)
def corpus_prepare_pipeline(spark, sf_dir):
    """Flagship composition: quality-filter -> exact-dedup ->
    token-count -> split -> per-split stats, in one declarative plan."""
    corpus = _exact_corpus(spark, sf_dir)
    n_words = (
        F.length(F.trim(F.col("text")))
        - F.length(F.replace(F.trim(F.col("text")), F.lit(" "), F.lit("")))
        + 1
    )
    avg_wl = (F.length("text") - n_words + 1).cast("double") / n_words
    quality = (
        F.least(F.lit(1.0), n_words.cast("double") / 100.0) * 0.5
        + F.least(F.lit(1.0), avg_wl / 8.0) * 0.5
    )
    scored = corpus.select(
        "doc_id", "text", n_words.alias("n_words"), quality.alias("quality")
    )
    kept = scored.where(F.col("quality") >= _MIN_QUALITY)

    # exact dedup: min doc_id survives per content hash — the same
    # shape as dedup_exact, fused into the pipeline
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        kept.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "n_words", "quality")
    )

    bucket = _hash_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test")
    )
    tagged = deduped.select(
        split.alias("split"),
        "n_words",
        F.round(F.col("quality") * 1000000).cast("long").alias("q_1e6"),
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_tokens"),
        F.sum("q_1e6").cast("long").alias("sum_quality_1e6"),
    )
