"""Fixed pure-Python CPU calibration loop (VERDICT r16 item 3).

Measures the EXACT 20M-iteration 64-bit LCG mix that
BENCH_LOCAL_r16.json recorded as `cpu_calib_20m_mix_sec` = 3.888
(best of 3), so each round can scale bench expectations by the
measured CPU-speed ratio BEFORE adjudicating per-query drift: a
calibrated common-subset total still >1.05x of the r14 baseline means
bisect the code/JVM/layout, not re-argue environment.

Run on a QUIET box (no concurrent pytest/bench Spark sessions).

Usage: python scripts/cpu_calib.py   ->  prints one JSON line.
"""

import json
import time

R16_REFERENCE_SEC = 3.888


def measure(n_iter=20_000_000, passes=3):
    best = None
    for _ in range(passes):
        t0 = time.perf_counter()
        h = 0
        for i in range(n_iter):
            h = (h * 1103515245 + i) & 0xFFFFFFFFFFFFFFFF
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


if __name__ == "__main__":
    best = measure()
    print(
        json.dumps(
            {
                "cpu_calib_20m_mix_sec": round(best, 3),
                "r16_reference_sec": R16_REFERENCE_SEC,
                "ratio_vs_r16": round(best / R16_REFERENCE_SEC, 3),
            }
        )
    )
