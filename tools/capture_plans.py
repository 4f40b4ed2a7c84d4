"""Capture ``.explain("formatted")`` for registered queries into
``plans/r16/<name>_<tag>.txt`` (optimization-round evidence files).

Usage:
    python tools/capture_plans.py <tag> <name> [<name> ...]
    python tools/capture_plans.py <tag> --headline      # every bench.py HEADLINE query

Plan capture triggers analysis + physical planning but NO execution, so it
is cheap and safe to run on a loaded box. AQE plans print
``isFinalPlan=false`` by design (pre-execution snapshot).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_active911_spark.plans import registry  # noqa: E402
from etl_active911_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
)


def main() -> None:
    tag = sys.argv[1]
    registry.load_all()
    if sys.argv[2] == "--headline":
        import bench

        names = [n for n in bench.HEADLINE if n in registry.QUERIES]
    else:
        names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
