"""Interleaved same-phase A/B for the round-18 in-task pair-expansion
change set (optimization 4). Alternates old-tree / new-tree invocations
of scripts/time_queries.py (each = min of two clean passes, memo caches
cleared between passes) over the affected bench lines, N rounds, and
reports per-query min over the rounds for each side.

Usage: python scripts/ab_invidx_r18.py <sf_dir> <rounds> [out.json]
"""

import json
import subprocess
import sys

QUERIES = [
    "dedup_minhash_lsh",
    "dedup_near_jaccard",
    "dedup_simhash_pairs",
    "dedup_lsh_recall_report",
    "corpus_duplicate_ngrams",
    "text_knn_graph",
    "corpus_dedup_waterfall",
    "dedup_containment",
]

TREES = {"old": "/tmp/r18_old", "new": "/root/repo"}


def run(tree, sf_dir):
    out = subprocess.run(
        [sys.executable, f"{tree}/scripts/time_queries.py", sf_dir]
        + QUERIES,
        capture_output=True,
        text=True,
        cwd=tree,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["queries"]


def main():
    sf_dir = sys.argv[1]
    rounds = int(sys.argv[2])
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    results = {"old": {}, "new": {}, "rounds": []}
    for r in range(rounds):
        rnd = {}
        for side in ("old", "new"):
            q = run(TREES[side], sf_dir)
            rnd[side] = q
            for k, v in q.items():
                cur = results[side].get(k)
                results[side][k] = v if cur is None else min(cur, v)
            print(f"round {r + 1} {side}: "
                  + json.dumps({k: q[k] for k in QUERIES}), flush=True)
        results["rounds"].append(rnd)
    summary = {
        k: {
            "old": results["old"][k],
            "new": results["new"][k],
            "ratio": round(results["new"][k] / results["old"][k], 3),
        }
        for k in QUERIES
    }
    results["summary"] = summary
    print(json.dumps(summary, indent=1))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
