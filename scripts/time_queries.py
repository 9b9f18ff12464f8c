"""Ad-hoc per-query timing with the bench.py protocol (same session
config, same warmup discipline, min of two passes, memo caches cleared
between passes). Usage:

    python scripts/time_queries.py [sf_dir] query [query ...]

Prints one JSON line like bench.py. Meant for iterating on a handful
of queries without paying the full HEADLINE run.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ), args
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from bench import _clear_all_memo_caches

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-data-test-time-queries")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entry_mod.queries()

    # JIT warmup at the smallest sf, excluded from timings
    for name in names:
        try:
            qmap[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as exc:
            print(f"warmup failed for {name}: {exc!r}", file=sys.stderr)
    _clear_all_memo_caches()

    timings = {}
    for _pass in range(2):
        _clear_all_memo_caches()
        for name in names:
            t0 = time.time()
            qmap[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    print(
        json.dumps(
            {
                "metric": "adhoc_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
