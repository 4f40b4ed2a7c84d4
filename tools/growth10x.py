"""Anchor-set growth check at 10x rows (r15, VERDICT r14 item 6).

Builds a synthetic 10x fixture from sf0.1 and times the frozen 17-anchor
gate set against it with the bench.py protocol (global untimed JIT pass,
per-query untimed warm-up, medians) — producing the SCALE.md growth
table. The fixture preserves the sf0.1 DISTRIBUTION, not just the row
count:

- Every big-entity key shifts by ``r * OFFSET`` per replica, with OFFSET
  = lcm(1..30): all ``key % m`` fixture slices (injections, variant
  indexes, the o_orderkey%29 parse cases) and all ``key // 4 % 3``-style
  sub-residues are preserved verbatim in every replica, and foreign keys
  stay consistent because both sides shift together.
- Dimension tables (region, nation) are NOT replicated and dimension FKs
  (nationkey) are NOT shifted — dims stay broadcast-sized at scale, the
  realistic shape.
- Document TEXT is mutated per replica (every 5th token, phase r % 5,
  replaced by a replica-unique token): cross-replica trigram Jaccard
  drops below the near-dup threshold, so the LSH anchor sees the SAME
  band-bucket size distribution at 10x docs instead of artificial
  10-member exact-duplicate families (which would quadratically inflate
  pair counts and measure a different problem). Within-replica dup
  structure is preserved (mutations are position-keyed, so near-dup
  pairs mutate in lockstep).
- Embedding VALUES repeat across replicas (cosine cost is
  value-independent); vec_ids shift like doc_ids.

Usage:
    python tools/growth10x.py build [--reps 10] [--out /tmp/growth10x]
    python tools/growth10x.py run --dir /tmp/growth10x [--runs 3]
    python tools/growth10x.py run --dir /root/testdata/sf0.1  # denominator
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

sys.path.insert(0, ".")

#: lcm(1..30): every modulus any fixture slice uses divides this, and
#: OFFSET // 4 (etc.) keeps every documented sub-residue too.
OFFSET = math.lcm(*range(1, 31))

_SHIFT_KEYS = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def build(src: str, out: str, reps: int) -> None:
    from pyspark.sql import functions as F

    from etl_active911_spark.io import TABLES, read_table
    from etl_active911_spark.session import get_spark

    spark = get_spark("growth10x-build")
    for t in TABLES:
        base = read_table(spark, src, t)
        keys = _SHIFT_KEYS[t]
        if not keys:
            base.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
            continue
        parts = []
        for r in range(reps):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(r * OFFSET))
            if t == "documents" and r > 0:
                toks = F.split(F.col("text"), " ")
                mut = F.transform(
                    toks,
                    lambda tok, i: F.when(
                        (i + F.lit(r)) % 5 == 0,
                        F.concat(F.lit(f"g{r}x"), i.cast("string")),
                    ).otherwise(tok),
                )
                rep = rep.withColumn("text", F.array_join(mut, " "))
            parts.append(rep)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(t, "->", f"{out}/{t}.parquet", flush=True)
    spark.stop()


def run(sf_dir: str, runs: int) -> None:
    from etl_active911_spark.plans import registry
    from etl_active911_spark.session import get_spark

    registry.load_all()
    import bench

    spark = get_spark("growth10x-run")
    anchors = bench.HEADLINE[:17]
    for name in anchors:  # global untimed pass (rule 32: JVM-wide JIT)
        registry.QUERIES[name](spark, sf_dir).count()
    out = {}
    for name in anchors:
        registry.QUERIES[name](spark, sf_dir).count()  # per-query warm-up
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
        times.sort()
        out[name] = round(times[len(times) // 2], 3)
        print(name, out[name], flush=True)
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "medians": out}))
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--src", default="/root/testdata/sf0.1")
    b.add_argument("--out", default="/tmp/growth10x")
    b.add_argument("--reps", type=int, default=10)
    r = sub.add_parser("run")
    r.add_argument("--dir", required=True)
    r.add_argument("--runs", type=int, default=3)
    a = ap.parse_args()
    if a.cmd == "build":
        build(a.src, a.out, a.reps)
    else:
        run(a.dir, a.runs)
