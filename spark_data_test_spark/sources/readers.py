"""Source/sink coverage beyond parquet (SURVEY.md §2.1).

The reference reads any DataFrameReader format via per-source options
(io_utils.py:36-38; README shows csv with header). These helpers add
explicit-schema readers (schema inference is a full extra pass over the
data — never acceptable at 100 TB) and driver-contract queries proving
CSV sink→source and JSON codec fidelity.
"""

import hashlib

import pyspark.sql.functions as F

from spark_data_test_spark.operators.relational import cents, query, t


def read_csv(spark, path, schema=None, **options):
    """CSV with explicit schema by default; inference only if asked."""
    reader = spark.read.options(**{"header": "true", **options})
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark, path, schema=None, **options):
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


@query(
    "source_csv_roundtrip",
    """
    SELECT p_brand, COUNT(*) AS cnt,
           CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS total_size
    FROM part GROUP BY p_brand
    """,
)
def source_csv_roundtrip(spark, sf_dir):
    """S2/S4 with the csv format: write part (int/string columns) to a
    scratch csv with options, read it back with an explicit schema, and
    aggregate — the oracle aggregates the original parquet, so any
    fidelity loss in the csv sink/source fails the hash."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"/tmp/spark_graft_csv/{digest}/part"
    (
        p.write.mode("overwrite")
        .options(header="true", delimiter="|")
        .csv(path)
    )
    back = read_csv(
        spark,
        path,
        schema="p_partkey bigint, p_brand string, p_size int",
        delimiter="|",
    )
    return back.groupBy("p_brand").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("p_size").cast("long")).alias("total_size"),
    )


@query(
    "source_json_roundtrip",
    """
    SELECT event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY event_type
    """,
)
def source_json_roundtrip(spark, sf_dir):
    """JSON codec both directions without touching disk: rows ->
    to_json(struct) -> from_json -> fields -> aggregate. Metric goes
    through integer cents *before* serialization so the round trip is
    exact."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        F.to_json(
            F.struct(
                F.col("event_type"), cents(F.col("value")).alias("value_cents")
            )
        ).alias("js"),
    )
    parsed = ev.select(
        F.from_json(
            F.col("js"), "event_type string, value_cents bigint"
        ).alias("r")
    )
    return parsed.groupBy(F.col("r.event_type").alias("event_type")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("r.value_cents")).alias("value_cents"),
    )


@query(
    "source_bucketed_table_roundtrip",
    """
    SELECT o.o_orderstatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def source_bucketed_table_roundtrip(spark, sf_dir):
    """S1: catalog-table scan via a bucketed write+read round trip.

    Both sides are bucketed on the join key, so the fact-fact join off
    the table scans is exchange-free (the 100 TB posture asserted by
    tests/test_bucketed.py); the oracle re-derives the aggregate from
    the original parquet, so any fidelity loss in the table round trip
    fails the hash.
    """
    from spark_data_test_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    import shutil
    import uuid

    from spark_data_test_spark.utils.spark_utils import local_df

    # per-run uuid scratch root + table names: concurrent processes on
    # the same sf_dir never collide, and the whole footprint (external
    # files AND catalog entries) is removed once the tiny aggregate is
    # materialized
    run_id = uuid.uuid4().hex[:12]
    base = f"/tmp/spark_graft_bucketed/{run_id}"
    o_tbl, l_tbl = f"b_orders_{run_id}", f"b_lineitem_{run_id}"
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    try:
        write_bucketed(o, o_tbl, ["o_orderkey"], num_buckets=8, path=f"{base}/orders")
        write_bucketed(li, l_tbl, ["o_orderkey"], num_buckets=8, path=f"{base}/lineitem")
        joined = read_bucketed(spark, o_tbl).join(
            read_bucketed(spark, l_tbl), ["o_orderkey"]
        )
        agg = joined.groupBy("o_orderstatus").agg(
            F.count("*").alias("cnt"),
            F.sum(cents(F.col("o_totalprice"))).alias("price_cents"),
        )
        rows, schema = agg.collect(), agg.schema
    finally:
        for tbl in (o_tbl, l_tbl):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(base, ignore_errors=True)
    return local_df(spark, rows, schema)


@query(
    "sink_partitioned_parquet",
    """
    SELECT event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events WHERE event_id % 3 = 0 GROUP BY event_type
    """,
)
def sink_partitioned_parquet(spark, sf_dir):
    """S5: sink with explicit output partition-count control
    (``no_of_partitions`` -> coalesce when shrinking, repartition when
    growing, utils/io_utils.py), then read the sink back and aggregate —
    the oracle aggregates the original table, so the round trip must be
    lossless and complete across all output files."""
    from spark_data_test_spark.entities.config import OutputConfig
    from spark_data_test_spark.utils.io_utils import write_result

    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"/tmp/spark_graft_partsink/{digest}/events"
    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("event_id") % 3 == 0)
        .select("event_id", "event_type", "value")
    )
    write_result(
        ev, path, OutputConfig(output_dir=path, no_of_partitions=4)
    )
    back = spark.read.parquet(path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(cents(F.col("value"))).alias("value_cents"),
    )


@query(
    "source_orc_roundtrip",
    """
    SELECT n_regionkey, COUNT(*) AS cnt,
           CAST(SUM(CAST(c_acctbal_cents AS BIGINT)) AS BIGINT) AS acctbal_cents
    FROM (
      SELECT n.n_regionkey, CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS c_acctbal_cents
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey)
    GROUP BY n_regionkey
    """,
)
def source_orc_roundtrip(spark, sf_dir):
    """S2/S4 with the ORC format (the second columnar container Spark
    ships natively): write the customer-nation join to ORC, read it
    back, and aggregate. DuckDB cannot read ORC, so the oracle
    re-derives the aggregate from the original parquet — which is the
    stronger check anyway: any fidelity loss in the ORC sink/source
    (type mapping, nulls, predicate pushdown layer) breaks the hash.
    The metric rides as integer cents so the round trip is exact by
    construction."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "n_regionkey", cents(F.col("c_acctbal")).alias("cbal")
    )
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"/tmp/spark_graft_orc/{digest}/customer"
    joined.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("cbal").alias("acctbal_cents"),
    )


@query(
    "source_xml_roundtrip",
    """
    SELECT event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY event_type
    """,
)
def source_xml_roundtrip(spark, sf_dir):
    """XML codec both directions without touching disk (Spark 4
    to_xml/from_xml): rows -> XML string -> parsed struct -> fields ->
    aggregate. The metric rides as integer cents before serialization
    so the round trip is exact; the oracle aggregates the original
    table, so any codec fidelity loss breaks the hash."""
    ev = t(spark, sf_dir, "events").select(
        F.to_xml(
            F.struct(
                F.col("event_type"), cents(F.col("value")).alias("value_cents")
            )
        ).alias("x"),
    )
    parsed = ev.select(
        F.from_xml(
            F.col("x"), "event_type string, value_cents bigint"
        ).alias("r")
    )
    return parsed.groupBy(F.col("r.event_type").alias("event_type")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("r.value_cents")).alias("value_cents"),
    )


_PRUNE_DAY_US = 86_400_000_000
_PRUNE_DAYS = (19723, 19724, 19725)  # 2024-01-01..03 as epoch days


@query(
    "sink_partition_pruned_read",
    f"""
    SELECT epoch_us(ts) // {_PRUNE_DAY_US} AS day, event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    WHERE epoch_us(ts) // {_PRUNE_DAY_US} IN {_PRUNE_DAYS}
    GROUP BY 1, 2
    """,
)
def sink_partition_pruned_read(spark, sf_dir):
    """Hive-partitioned sink + PRUNED read: events land in day=<epoch
    day> directories, and the read-back filters to three days — the
    filter must resolve at PLANNING time against directory names
    (PartitionFilters in the scan, pinned by tests/test_sink_partitions.py),
    so a 100 TB history scan touches only the requested days' files.
    The oracle aggregates the ORIGINAL table under the same predicate:
    the hash-match proves the partitioned round trip is lossless AND
    the pruned read returns exactly the full-scan answer."""
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"/tmp/spark_graft_daypart/{digest}/events"
    ev = t(spark, sf_dir, "events").select(
        F.expr(f"unix_micros(ts) div {_PRUNE_DAY_US}").alias("day"),
        "event_type",
        "value",
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(path)
    # partition discovery infers the directory-name column as INT; cast
    # back to the written LONG so the round trip preserves the schema
    # (the oracle emits BIGINT). Casting after the filter keeps the
    # pruning predicate on the discovered partition column.
    back = (
        spark.read.parquet(path)
        .where(F.col("day").isin(*_PRUNE_DAYS))
        .withColumn("day", F.col("day").cast("long"))
    )
    return back.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(cents(F.col("value"))).alias("value_cents"),
    )


@query(
    "source_text_roundtrip",
    """
    WITH lines AS (
      SELECT replace(replace(text, chr(10), ' '), chr(13), ' ') AS line
      FROM documents)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(strlen(line)) AS BIGINT) AS n_bytes,
           MIN(md5(line)) AS min_md5,
           MAX(md5(line)) AS max_md5,
           BIT_XOR(CAST('0x' || substr(md5(line), 1, 15) AS BIGINT))
             AS content_xor
    FROM lines
    """,
)
def source_text_roundtrip(spark, sf_dir):
    """S2/S4 with the line-delimited TEXT format (the raw-corpus
    interchange format every scraped-text pipeline starts from): write
    one document per line, read the directory back with the text
    source, and fingerprint the content with order-insensitive
    aggregates (count, byte sum, min/max md5, and a bit_xor content
    checksum over a 60-bit md5 prefix — XOR commutes, so any line
    order, and thus any partitioning, hashes identically). Newlines
    are mapped to spaces BEFORE the sink on both sides — the format's
    own framing constraint, applied identically in the oracle, which
    fingerprints the original table directly: any fidelity loss in the
    sink->source trip (encoding, truncation, line splitting) breaks
    the hash."""
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"/tmp/spark_graft_text/{digest}/documents"
    lines = t(spark, sf_dir, "documents").select(
        F.regexp_replace(F.col("text"), "[\\n\\r]", " ").alias("line")
    )
    lines.write.mode("overwrite").text(path)
    back = spark.read.text(path)
    h = F.md5(F.col("value"))
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        # octet_length, not length: the column promises BYTES and the
        # oracle's strlen counts bytes — identical on this ASCII corpus,
        # but the equivalence should be structural, not coincidental
        F.sum(F.octet_length(F.col("value"))).alias("n_bytes"),
        F.min(h).alias("min_md5"),
        F.max(h).alias("max_md5"),
        F.expr(
            "bit_xor(cast(conv(substring(md5(value), 1, 15), 16, 10) as bigint))"
        ).alias("content_xor"),
    )


def _stage_binary_files(spark, sf_dir, root):
    """Write documents as one binary file per doc_id, EXECUTOR-side
    (foreachPartition) — the way a media lake lands: many small opaque
    objects named by key, written by the tasks that hold them, never
    funneled through the driver."""
    import os
    import shutil

    # freshness token: staged files are valid only for THIS source file
    # (mtime+size). A bare marker would serve stale bytes — and phantom
    # doc_*.bin leftovers — after the testdata is regenerated.
    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    token = f"{src}|{st.st_mtime_ns}|{st.st_size}"
    os.makedirs(root, exist_ok=True)
    marker = f"{root}/_STAGED"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == token:
                return
        shutil.rmtree(root, ignore_errors=True)  # stale: rebuild from scratch
        os.makedirs(root, exist_ok=True)
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("content")
    )

    def write_partition(rows):
        for row in rows:
            # temp-then-rename: concurrent stagers write identical
            # bytes, so the last rename wins harmlessly
            tmp = f"{root}/.doc_{row.doc_id}.tmp.{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(bytes(row.content))
            os.replace(tmp, f"{root}/doc_{row.doc_id}.bin")

    docs.foreachPartition(write_partition)
    with open(marker + ".tmp", "w") as fh:
        fh.write(token)
    os.replace(marker + ".tmp", marker)


@query(
    "source_binaryfile_roundtrip",
    """
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def source_binaryfile_roundtrip(spark, sf_dir):
    """Binary-object ingestion with the ``binaryFile`` source — the
    entry point of every multimodal pipeline (images/audio land as
    opaque files; Spark lists the directory in parallel and each task
    reads its files' bytes). Documents are staged as one file per doc
    (executor-side), read back as (path, content) rows, keyed by
    parsing the id out of the file name, and fingerprinted per object.
    The oracle fingerprints the ORIGINAL table (md5 over the same
    UTF-8 bytes), so a lost, truncated, or re-encoded object breaks
    the per-row hash. At 100 TB the same plan holds: listing
    parallelizes across the driver's file index, content never moves
    through the driver, and the downstream join key comes from the
    path, not the payload."""
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    root = f"/tmp/spark_graft_binfiles/{digest}"
    _stage_binary_files(spark, sf_dir, root)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(root)
    )
    return back.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.length(F.col("content")).alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


@query(
    "sink_clustered_layout",
    f"""
    SELECT epoch_us(ts) // {_PRUNE_DAY_US} AS day,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def sink_clustered_layout(spark, sf_dir):
    """Data-layout control: the CLUSTERED write — repartitionByRange on
    the filter columns + sortWithinPartitions — is the second pruning
    lever after hive partitioning (sink_partition_pruned_read covers
    that one). Range partitioning puts each event_type's rows in few
    files and the in-file sort tightens parquet row-group min/max
    bounds, so a selective read-back skips whole files and row groups
    instead of scanning history; at 100 TB this is the difference
    between a layout that answers point queries and one that rescans
    the lake. The oracle runs the same filtered aggregate on the
    ORIGINAL table: the hash-match proves the clustered round trip is
    lossless and the skipping read exact."""
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"/tmp/spark_graft_clustered/{digest}/events"
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(ts) div {_PRUNE_DAY_US}").alias("day"),
        "value",
    )
    (
        ev.repartitionByRange(8, "event_type", "day")
        .sortWithinPartitions("event_type", "day")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).where(F.col("event_type") == "purchase")
    return back.groupBy("day").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(cents(F.col("value"))).alias("value_cents"),
    )


def _spread16_sql(x, shift_fn):
    """Bit-spreading (Morton interleave half): insert a 0 bit between
    every bit of a 16-bit value, via the standard magic-mask stages.
    ``shift_fn`` renders a left shift — DuckDB spells it ``<<``, Spark
    SQL ``shiftleft`` — over otherwise identical integer arithmetic.
    The operand is forced to BIGINT first: on an INT32 operand a
    spread value with bit 15 set shifts past 2^31, where DuckDB raises
    an overflow and Spark silently wraps negative — BIGINT keeps both
    engines exact. Callers should pass a simple column reference: each
    magic-mask stage textually doubles the operand, so a compound
    expression would be embedded 16 times (compute it once in an inner
    subquery instead)."""
    e = f"(CAST({x} AS BIGINT) & 65535)"
    for sh, mask in ((8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765)):
        e = f"(({e} | {shift_fn(e, sh)}) & {mask})"
    return e


def _morton_sql(d1, d2, shift_fn):
    return f"({_spread16_sql(d1, shift_fn)} | {shift_fn(_spread16_sql(d2, shift_fn), 1)})"


_Z_DAYS = (19723, 19724)
_Z_TYPES = ("purchase", "click")


@query(
    "sink_zorder_layout",
    f"""
    WITH dims AS (
      SELECT epoch_us(ts) // {_PRUNE_DAY_US} AS day, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS c,
             ascii(substr(event_type, 1, 1)) AS code
      FROM events),
    keyed AS (
      SELECT day, event_type, c,
             {_morton_sql("day", "code", lambda e, n: f"({e} << {n})")} AS zkey
      FROM dims)
    SELECT day, event_type, COUNT(*) AS cnt,
           CAST(SUM(c) AS BIGINT) AS value_cents,
           CAST(MIN(zkey) AS BIGINT) AS zmin,
           CAST(MAX(zkey) AS BIGINT) AS zmax
    FROM keyed
    WHERE day IN {_Z_DAYS} AND event_type IN {_Z_TYPES}
    GROUP BY day, event_type
    """,
)
def sink_zorder_layout(spark, sf_dir):
    """Z-ORDER (Morton) clustering — the multi-dimensional layout
    lever: linear clustering (sink_clustered_layout) serves ONE filter
    column well and the others badly; interleaving the bits of both
    dimensions into one sort key keeps rows close in EVERY dimension,
    so a 2-dim selective read skips files and row groups on both
    predicates (the Databricks/Delta Z-ORDER idea, built from plain
    Catalyst bit arithmetic — no engine extension). The Morton key is
    the classic magic-mask bit spread; the oracle replays the IDENTICAL
    integer stages (validated bit-for-bit) and the emitted per-group
    zmin/zmax force the value-level check of the interleave itself,
    not just of the aggregate.

    Shape: key computation is scan-side codegen; the write is ONE
    range-shuffle on the z-key (repartitionByRange balances output
    files by key distribution); the read-back pushes both filters to
    the scan. Layout changes where rows LAND, never what they are —
    the aggregate must equal the original-table oracle regardless."""
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"/tmp/spark_graft_zorder/{digest}/events"
    dims = t(spark, sf_dir, "events").select(
        F.expr(f"unix_micros(ts) div {_PRUNE_DAY_US}").alias("day"),
        "event_type",
        cents(F.col("value")).alias("c"),
        F.expr("ascii(substr(event_type, 1, 1))").alias("code"),
    )
    ev = dims.select(
        "day",
        "event_type",
        "c",
        F.expr(
            _morton_sql("day", "code", lambda e, n: f"shiftleft({e}, {n})")
        ).alias("zkey"),
    )
    (
        ev.repartitionByRange(8, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).where(
        F.col("day").isin(*_Z_DAYS) & F.col("event_type").isin(*_Z_TYPES)
    )
    return back.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("c").alias("value_cents"),
        F.min("zkey").alias("zmin"),
        F.max("zkey").alias("zmax"),
    )


@query(
    "source_schema_evolution",
    """
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 0
                         THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS late_col_cents,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
             AS rows_missing_col
    FROM orders GROUP BY o_orderstatus
    """,
)
def source_schema_evolution(spark, sf_dir):
    """Schema EVOLUTION on read: generation-1 files were written before
    a column existed, generation-2 files carry it; one
    ``mergeSchema=true`` read unions both generations and surfaces the
    missing column as NULL on the old rows — the append-only lake
    reality (backfills are a 100 TB rewrite; evolving the READ is the
    scalable answer). The aggregate splits the metric by generation,
    and the oracle reconstructs both generations from the original
    table — a dropped row, a misaligned column, or a non-NULL default
    on the old generation all break the hash. By-NAME column
    resolution is the load-bearing property: parquet footers, not
    positions, line the generations up. The two-generation artifact is
    staged under a per-run uuid root and removed in ``finally`` (same
    no-shared-path discipline as the streaming scratch roots); the
    aggregate is materialized before cleanup — it is one row per
    order status, driver-tiny by domain."""
    import shutil
    import uuid

    from spark_data_test_spark.utils.spark_utils import local_df

    run_root = f"/tmp/spark_graft_schemaevo/{uuid.uuid4().hex[:12]}"
    path = f"{run_root}/orders"
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", cents(F.col("o_totalprice")).alias("price_cents")
    )
    gen1 = o.where(F.col("o_orderkey") % 2 == 1).drop("price_cents")
    gen2 = o.where(F.col("o_orderkey") % 2 == 0)
    try:
        gen1.write.mode("overwrite").parquet(f"{path}/gen=1")
        gen2.write.mode("overwrite").parquet(f"{path}/gen=2")
        back = spark.read.option("mergeSchema", "true").parquet(path)
        agg = back.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.coalesce(F.sum("price_cents"), F.lit(0)).alias("late_col_cents"),
            F.sum(
                F.when(F.col("price_cents").isNull(), 1).otherwise(0)
            ).cast("long").alias("rows_missing_col"),
        )
        rows = agg.collect()
        schema = agg.schema
    finally:
        shutil.rmtree(run_root, ignore_errors=True)
    return local_df(spark, rows, schema)


# ---------------------------------------------------------------------------
# Inverted index as a partitioned table artifact
# ---------------------------------------------------------------------------

_IDX_PROBE_TOKENS = ("join", "hash", "scan")

# Test-visible hook: the formatted physical plan of the most recent
# inverted-index probe, captured INSIDE the staged artifact's lifecycle
# (the artifact is deleted before the caller sees the result frame, so
# the pruning assertion cannot be made on the returned localized rows).
_last_invidx_probe_plan = None


@query(
    "sink_inverted_index_roundtrip",
    f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      WHERE tok <> '')
    SELECT tok, doc_id FROM toks
    WHERE tok IN {_IDX_PROBE_TOKENS}
    ORDER BY tok, doc_id
    """,
)
def sink_inverted_index_roundtrip(spark, sf_dir):
    """Inverted index as a PERSISTED, partition-pruned table artifact:
    build (token -> sorted posting list) from the corpus in one
    shuffle, write it hive-partitioned by the token's first letter,
    then answer a 3-token lookup by reading the index BACK — the
    prefix filter resolves at planning time against directory names,
    so the probe touches only 3 of 26 partitions and each touched file
    carries postings arrays, not documents. This is the search-side
    companion of `corpus_duplicate_ngrams`'s in-flight index: at
    100 TB the index is the queryable artifact and the corpus is cold
    storage. The oracle answers the same lookup from the RAW corpus —
    the hash-match proves the index build, the partitioned round trip,
    and the pruned probe are lossless end-to-end. The index artifact
    is staged under a per-run uuid root and removed in ``finally`` —
    concurrent sessions on the same dataset never race on a shared
    path, and a crash-looping caller leaves nothing behind (the probe
    result is materialized before cleanup; it is 3 tokens' postings,
    driver-tiny by construction)."""
    import shutil
    import uuid

    from spark_data_test_spark.utils.spark_utils import local_df

    run_root = f"/tmp/spark_graft_invidx/{uuid.uuid4().hex[:12]}"
    path = f"{run_root}/tokens"
    d = t(spark, sf_dir, "documents")
    postings = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("postings"))
        .withColumn("prefix", F.substring("tok", 1, 1))
    )
    try:
        postings.write.mode("overwrite").partitionBy("prefix").parquet(path)
        prefixes = sorted({tok[0] for tok in _IDX_PROBE_TOKENS})
        back = (
            spark.read.parquet(path)
            .where(F.col("prefix").isin(prefixes))
            .where(F.col("tok").isin(*_IDX_PROBE_TOKENS))
        )
        probe = (
            back.select("tok", F.explode("postings").alias("doc_id"))
            .orderBy("tok", "doc_id")
        )
        global _last_invidx_probe_plan
        from spark_data_test_spark.plans.audit import formatted_plan

        _last_invidx_probe_plan = formatted_plan(probe)
        rows = probe.collect()
        schema = probe.schema
    finally:
        shutil.rmtree(run_root, ignore_errors=True)
    return local_df(spark, rows, schema)


def zorder_key(df, cols, bits=16, key_col="zkey"):
    """Library operator: N-dimensional Z-ORDER (Morton) key for
    arbitrary frames — adds ``key_col`` interleaving the low ``bits``
    bits of each column in ``cols`` (column i owns bit positions
    ``b * n + i``), the multi-dimensional clustering lever the
    registered `sink_zorder_layout` query pins for the 2-dim
    magic-mask case. Write with
    ``df.repartitionByRange(N, key_col).sortWithinPartitions(key_col)``
    and a selective read on ANY keyed dimension skips files and row
    groups (the Databricks/Delta Z-ORDER idea from plain Catalyst bit
    arithmetic — no engine extension).

    Values are masked to their low ``bits`` bits (callers should
    offset-normalize negatives or wider domains first);
    ``len(cols) * bits`` must fit a signed 64-bit key. The key is a
    scan-side whole-stage-codegen expression (one bounded
    ``aggregate`` loop per column, OR-combined) — no shuffle, no UDF."""
    cols = list(cols)
    n = len(cols)
    if not cols:
        raise ValueError("zorder_key: need at least one column")
    if n * int(bits) > 63:
        raise ValueError(
            f"zorder_key: {n} cols x {bits} bits exceeds a 63-bit key"
        )
    parts = []
    for i, c in enumerate(cols):
        masked = f"(CAST({c} AS BIGINT) & {(1 << int(bits)) - 1})"
        parts.append(
            f"aggregate(sequence(0, {int(bits) - 1}), cast(0 AS bigint),"
            f" (acc, b) -> acc | shiftleft(shiftright({masked}, b) & 1,"
            f" b * {n} + {i}))"
        )
    return df.withColumn(key_col, F.expr(" | ".join(parts)))
