"""Physical-plan auditing (SURVEY.md §4 / the 100 TB checklist).

Helpers to assert that a DataFrame's physical plan has the properties
that matter at scale: filters and column pruning pushed into the
parquet scan, dimension joins broadcast, aggregates partial (map-side
combine), and expression pipelines inside whole-stage codegen.

Used by tests/test_plans.py as a regression gate so a refactor that
silently de-optimizes a plan (e.g. breaks pushdown by inserting a UDF)
fails CI, and by scripts/audit_plans.py for human inspection.
"""

import contextlib
import io


def formatted_plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def has_pushed_filter(df, fragment):
    """True if the scan-level PushedFilters mention ``fragment``."""
    plan = formatted_plan(df)
    return any(
        "PushedFilters" in line and fragment in line for line in plan.splitlines()
    )


def scan_read_schema(df):
    """The ReadSchema struct strings of every scan in the plan."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in formatted_plan(df).splitlines()
        if "ReadSchema:" in line
    ]


def has_broadcast_join(df):
    return "BroadcastHashJoin" in simple_plan(df)


def count_shuffles(df):
    """Shuffle Exchange operators in the plan — each repartitions its
    full input; the number to watch when reviewing a plan at scale.
    (Counted on the simple tree — formatted mode lists every operator
    twice; broadcast exchanges are not shuffles.)"""
    return sum(
        1
        for line in simple_plan(df).splitlines()
        if "Exchange hashpartitioning" in line
        or "Exchange rangepartitioning" in line
        or "Exchange SinglePartition" in line
    )


def plan_op_counts(df):
    """Physical-operator name -> count for the plan a run would
    actually EXECUTE. Counting on ``explain`` text overstates badly in
    two ways: it prints the full build lineage beneath every
    InMemoryRelation (a cached subtree runs once, ever), and
    materialized caches embed whole AQE report boxes whose indentation
    defeats text slicing. Walking the operator TREE avoids both:
    InMemoryTableScan has no children (the cached plan is a field, not
    a child), so recursion stops at cache boundaries, and
    AdaptiveSparkPlan is descended through its initialPlan explicitly."""
    from collections import Counter

    counts = Counter()

    def walk(node):
        name = node.nodeName()
        counts[name] += 1
        if name == "AdaptiveSparkPlan":
            walk(node.initialPlan())
            return
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return counts


def has_partial_aggregation(df):
    """Hash aggregation split into partial+final (map-side combine)."""
    return "partial_" in simple_plan(df)


def in_wholestage_codegen(df):
    """True if any pipeline compiles to a whole-stage-codegen subtree.
    Under AQE the pre-execution plan hides codegen markers, so ask the
    codegen explain mode directly."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    out = buf.getvalue()
    return "WholeStageCodegen subtrees" in out and "Found 0" not in out


def global_window_nodes(df):
    """simpleStrings of physical Window-family operators (Window,
    WindowGroupLimit, WindowInPandas) whose partition spec is EMPTY —
    the single-task global-sort shape: the operator's whole input
    funnels through ONE task's sort, fine only when that input is
    bounded by construction (an alphabet, a bucket histogram, a
    calendar spine, a post-``limit`` frame), a scale-killer when it is
    corpus-cardinality. Walks the tree ``plan_op_counts`` walks (AQE
    initialPlan descended, cache boundaries stop — memo-build lineage
    is audited where the memo owner is), so the same single-execution
    caveats apply."""
    found = []

    def walk(node):
        name = node.nodeName()
        if name.startswith("Window"):
            try:
                empty = node.partitionSpec().isEmpty()
            except Exception:
                # defensive: unknown Window-family node without a
                # partitionSpec accessor — surface it for inspection
                empty = True
            if empty:
                found.append(f"{name}: {node.simpleString(200)}")
        if name == "AdaptiveSparkPlan":
            walk(node.initialPlan())
            return
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return found
