"""Capture .explain("formatted") for the round-18-touched queries.

Usage: python scripts/capture_plans_r18.py <repo_root> <out_dir> <suffix>

Run once from the r17 snapshot worktree (suffix "before") and once from
HEAD (suffix "after"); writes plans/r18/<query>_<suffix>.txt. The
lifecycle queries execute their build/ingest/delete side effects while
the frame is constructed, so the captured plan is the final probe over
the committed state — the same frame the bench times.
"""

import os
import sys

repo = sys.argv[1]
out_dir = sys.argv[2]
suffix = sys.argv[3]
queries = sys.argv[4:] or [
    "similarity_pq_index_probe",
    "similarity_ivfpq_index_probe",
    "similarity_ivf_index_probe",
]

sys.path.insert(0, repo)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .appName("plan-capture-r18")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry_mod  # noqa: E402

qmap = entry_mod.queries()
os.makedirs(out_dir, exist_ok=True)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

for name in queries:
    df = qmap[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({len(plan)} bytes)")

spark.stop()
