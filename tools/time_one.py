"""Isolated timing of one or more registered queries in a FRESH session,
with the noop sink (guide §1.4: computes every column, discards output)
so the computation is timed, not the sink or driver materialization.

Usage:
    python tools/time_one.py <name> [<name> ...] [--runs N] [--count]

Prints per-query: ambient probe ratio, plan-build seconds, then each timed
run and the median. ``--count`` times the bench-contract ``.count()`` action
instead of the noop write (for like-for-like comparison with bench.py).
This tool is DIAGNOSTIC ONLY — bench.py remains the driver contract.
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
    args = sys.argv[1:]
    runs = 5
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    use_count = "--count" in args
    if use_count:
        args.remove("--count")
    names = args

    import bench

    registry.load_all()
    spark = get_spark("time-one")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"ambient probe: {bench._calib_probe()}")

    def act(df):
        if use_count:
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()

    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, SF_DIR)
        build = time.perf_counter() - t0
        act(df)  # untimed warm-up (codegen amortization, bench protocol)
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            act(registry.QUERIES[name](spark, SF_DIR))
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        print(
            f"{name}: build={build:.3f}s median={med:.3f}s "
            f"runs={[round(t, 3) for t in times]}"
        )


if __name__ == "__main__":
    main()
