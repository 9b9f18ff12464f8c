"""Registry-wide physical-plan audit (SURVEY.md §4 / the 100 TB
checklist).

Builds every batch query in ``__spark_entry__.queries()`` WITHOUT
executing it and reports the plan facts that matter at scale: shuffle
exchanges, broadcast vs sort-merge joins, cartesian products, partial
aggregation, and whole-stage codegen. CartesianProduct anywhere is
flagged loudly — on this engine every intentional small-side cross is
a broadcast, so a cartesian means the optimizer lost an equi-join.

Streaming queries are skipped (their sinks execute on build); the
pytest plan gates (tests/test_plans.py) pin the load-bearing cases,
this script is the human-inspection sweep across the whole registry.

Usage: python scripts/audit_plans.py [sf_dir] [query ...]
"""

import sys

sys.path.insert(0, "/root/repo")

SKIP_PREFIXES = ("streaming_",)  # execute on build (write scratch sinks)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from spark_data_test_spark.plans.audit import plan_op_counts
    from spark_data_test_spark.utils.spark_utils import get_session

    spark = get_session(master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    rows, cartesians = [], []
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        if name.startswith(SKIP_PREFIXES):
            continue
        try:
            ops = plan_op_counts(fn(spark, sf_dir))
        except Exception as exc:  # pragma: no cover - report, keep sweeping
            rows.append((name, f"BUILD ERROR: {exc}"))
            continue
        facts = {
            "shuffles": ops.get("Exchange", 0),
            "bhj": ops.get("BroadcastHashJoin", 0),
            "smj": ops.get("SortMergeJoin", 0),
            "bnlj": ops.get("BroadcastNestedLoopJoin", 0),
            "cartesian": ops.get("CartesianProduct", 0),
            "cached_scans": ops.get("InMemoryTableScan", 0),
        }
        if facts["cartesian"]:
            cartesians.append(name)
        rows.append(
            (
                name,
                "shuffles={shuffles} bhj={bhj} smj={smj} bnlj={bnlj}"
                " cartesian={cartesian} cached_scans={cached_scans}".format(**facts),
            )
        )

    width = max(len(n) for n, _ in rows)
    for name, desc in rows:
        print(f"{name:<{width}}  {desc}")
    print()
    if cartesians:
        print(f"CARTESIAN PRODUCTS (investigate): {cartesians}")
        sys.exit(1)
    print(f"{len(rows)} query plans audited; no cartesian products")


if __name__ == "__main__":
    main()
