"""Capture plans for the round-18 in-task pair-expansion change set
(optimization 4: banding / inverted-index self-joins -> in-task
expansion).

Usage: python scripts/capture_plans_r18b.py <repo_root> <out_dir> <suffix>

Run once from the pre-change worktree (suffix "invidx_before") and once
from HEAD (suffix "invidx_after"); writes plans/r18/<name>_<suffix>.txt.

Captures, at sf0.01:
  * explain("formatted") of the touched registered queries
    (dedup_simhash_pairs, corpus_duplicate_ngrams, dedup_minhash_lsh,
    dedup_near_jaccard, dedup_lsh_recall_report, dedup_containment,
    text_knn_graph);
  * explain("formatted") of the LAZY MinHash band-pairs build frame
    (dedup._band_pairs over the memoized distinct-text shingles) —
    the registered consumers read it through an eager localCheckpoint,
    so their own plans show a LogicalRDD leaf where the change lives;
  * the pre-persist gid-co build plan hook (dedup._last_gid_co_plan,
    simple explain) — the containment family persists its result, so
    the hook is where the discovery-join shape is visible.
"""

import os
import sys

repo = sys.argv[1]
out_dir = sys.argv[2]
suffix = sys.argv[3]

sys.path.insert(0, repo)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .appName("plan-capture-r18b")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry_mod  # noqa: E402
from spark_data_test_spark.operators import dedup  # noqa: E402
from spark_data_test_spark.plans.audit import formatted_plan  # noqa: E402

qmap = entry_mod.queries()
os.makedirs(out_dir, exist_ok=True)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

QUERIES = [
    "dedup_simhash_pairs",
    "corpus_duplicate_ngrams",
    "dedup_minhash_lsh",
    "dedup_near_jaccard",
    "dedup_lsh_recall_report",
    "dedup_containment",
    "text_knn_graph",
]


def write(name, text):
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(text)
    print(f"wrote {path} ({len(text)} bytes)")


for name in QUERIES:
    write(name, formatted_plan(qmap[name](spark, sf_dir)))

# the lazy band-pairs build (consumers read it through a checkpoint)
sh = dedup._cached_shingles(spark, sf_dir).withColumnRenamed("gid", "doc_id")
write("dedup_band_pairs_build", formatted_plan(dedup._band_pairs(dedup._minhash(sh))))

# the pre-persist gid-co build plan (captured by the module hook while
# dedup_containment above forced the fresh build)
if dedup._last_gid_co_plan is not None:
    write("dedup_gid_co_build", dedup._last_gid_co_plan)

spark.stop()
