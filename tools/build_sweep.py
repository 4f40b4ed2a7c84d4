"""Rule-35 attribution sweep: per-query driver-side plan-BUILD seconds for
every bench HEADLINE query (construction only, no action). Build cost is
re-paid on every bench invocation (warm-up + each timed run), so a query
whose build rivals its exec is a plan_memo/memo_cols candidate.

Usage: python tools/build_sweep.py [--runs N]   (default 3, median kept)

Output: one line per query `name build_med_sec`, sorted descending.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_active911_spark.plans import registry  # noqa: E402
from etl_active911_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    import bench

    registry.load_all()
    spark = get_spark("build-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name in bench.HEADLINE:
        if name not in registry.QUERIES:
            continue
        # one untimed construction first: lazy memo population (memo_cols /
        # plan_memo fills) is a once-per-process cost the bench's own
        # warm-up also amortizes — we want the steady-state per-call build
        registry.QUERIES[name](spark, SF_DIR)
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, SF_DIR)
            times.append(time.perf_counter() - t0)
        times.sort()
        out[name] = times[len(times) // 2]
    for name, t in sorted(out.items(), key=lambda kv: -kv[1]):
        print(f"{name} {t:.3f}")
    print(f"TOTAL_build_median_sum {sum(out.values()):.3f}")


if __name__ == "__main__":
    main()
