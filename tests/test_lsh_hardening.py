"""LSH hot-bucket hardening (VERDICT r04 items 2 & 7).

Three contracts:
1. The compact xxhash64 band keys generate the SAME candidate pairs as the
   oracle-pure string keys on real fixture data (collision-equality).
2. ``max_bucket`` drops flooded buckets: an adversarial corpus with >=10^4
   exact copies of one document completes without the n^2 pair explosion,
   and the guard's recall loss is confined to the flooded class.
3. ``near_dup_dedup`` (exact pre-collapse) is the real fix: on the same
   adversarial corpus the flood collapses to ONE representative, the
   mapping covers every document, and rep-level near-dup pairs equal the
   pairs of the distinct-text corpus.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from etl_active911_spark.io import read_table, spread
from etl_active911_spark.operators.dedup import (
    LSH_MAX_BUCKET,
    lsh_candidate_pairs,
    near_dup_dedup,
    verified_near_dup_pairs,
)
from tests.conftest import SF_ORACLE

N_FLOOD = 12_000  # > LSH_MAX_BUCKET: one band bucket would hold all of these


def _pairs(df):
    return set((r["doc_a"], r["doc_b"]) for r in df.collect())


def test_compact_band_keys_generate_identical_candidates(spark):
    docs = spread(read_table(spark, SF_ORACLE, "documents"), "doc_id")
    compact = _pairs(lsh_candidate_pairs(docs, oracle_pure=False))
    pure = _pairs(lsh_candidate_pairs(docs, oracle_pure=True))
    assert compact == pure and len(compact) > 0


def test_fixture_buckets_stay_below_hot_bucket_cap(spark):
    """ADVICE r11 item 4: the x2_stream_neardup oracle derives candidates
    from the UNCAPPED shared ``cand`` CTE while the Spark side applies
    ``lsh_candidate_pairs``' LSH_MAX_BUCKET guard — parity holds only
    because the cap is a calibrated NO-OP on the fixtures. Pin that
    calibration: the largest band bucket on the fixture corpus must stay
    below the cap (with margin), so a fixture regeneration that grows a
    flood breaks HERE loudly instead of as a silent oracle mismatch."""
    from etl_active911_spark.operators.dedup import lsh_band_rows, minhash_signatures

    docs = spread(read_table(spark, SF_ORACLE, "documents"), "doc_id")
    biggest = (
        lsh_band_rows(minhash_signatures(docs))
        .groupBy("band_key")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    # margin: the cap must not merely hold, it must hold with headroom —
    # half the cap keeps the no-op assumption safe under modest growth
    assert biggest <= LSH_MAX_BUCKET // 2, (
        f"largest fixture band bucket = {biggest}: the LSH_MAX_BUCKET "
        "no-op calibration the capped-Spark vs uncapped-oracle queries "
        "rely on is about to break — mirror the cap in the oracle cand "
        "CTEs before raising this bound"
    )


def _adversarial_corpus(spark):
    """N_FLOOD exact copies of one text + a small family of near-dups of a
    DIFFERENT text + unique filler docs. doc_id 0..N_FLOOD-1 = the flood."""
    flood_text = "the quick brown fox jumps over the lazy dog again and again " * 5
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    flood = spark.range(N_FLOOD).select(
        F.col("id").alias("doc_id"), F.lit(flood_text).alias("text")
    )
    near = spark.createDataFrame(
        [
            (N_FLOOD + 0, base),
            (N_FLOOD + 1, base + " lambda"),  # high-jaccard variant
            (N_FLOOD + 2, base + " lambda mu"),
        ],
        "doc_id long, text string",
    )
    uniq = spark.range(N_FLOOD + 10, N_FLOOD + 40).select(
        "id",
        F.concat_ws(
            " ",
            F.lit("unique filler document number"),
            F.col("id").cast("string"),
            F.sha2(F.col("id").cast("string"), 256),
        ).alias("text"),
    ).withColumnRenamed("id", "doc_id")
    return spread(flood.unionByName(near).unionByName(uniq), "doc_id")


def test_hot_bucket_cap_bounds_flooded_candidates(spark):
    """Without the cap the flood alone implies ~7*10^7 candidate pairs per
    band; with it, candidate generation stays near-instant and only the
    flooded class loses pairs (the documented recall trade)."""
    docs = _adversarial_corpus(spark)
    t0 = time.perf_counter()
    got = _pairs(lsh_candidate_pairs(docs, max_bucket=LSH_MAX_BUCKET))
    elapsed = time.perf_counter() - t0
    # the near-dup family (distinct texts, small buckets) must survive
    assert (N_FLOOD + 0, N_FLOOD + 1) in got
    # every flood-internal pair sits only in dropped buckets
    assert not any(a < N_FLOOD and b < N_FLOOD for a, b in got)
    assert elapsed < 120, f"capped candidate generation took {elapsed:.1f}s"


def test_exact_precollapse_is_the_real_fix(spark):
    docs = _adversarial_corpus(spark)
    mapping, rep_pairs = near_dup_dedup(docs)
    # mapping covers the whole corpus; the flood maps to one representative
    assert mapping.count() == N_FLOOD + 3 + 30
    flood_reps = (
        mapping.filter(F.col("doc_id") < N_FLOOD).select("rep_id").distinct().collect()
    )
    assert [r["rep_id"] for r in flood_reps] == [0]
    # rep-level pairs == pairs over the distinct-text corpus (no recall loss)
    distinct_docs = spread(
        docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id", "text"),
        "doc_id",
    )
    expected = _pairs(
        verified_near_dup_pairs(distinct_docs, persist_key="test.adversarial")
    )
    assert _pairs(rep_pairs) == expected
    assert (N_FLOOD + 0, N_FLOOD + 1) in expected


def test_precollapse_components_compose_to_full_corpus_components(spark):
    """The docstring claim that makes pre-collapse SOUND, verified:
    connected components over rep-level pairs, expanded through the
    exact-class mapping, must equal components computed directly over
    the uncollapsed corpus (exact duplicates share their rep's
    component; representatives' components agree)."""
    from pyspark.sql import functions as F

    from etl_active911_spark.operators.clustering import connected_components_star

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    rows = []
    # two near-dup families with exact-dup members sprinkled in
    for i in range(6):
        rows.append((i, base))                     # exact dups of family A's root
    rows.append((6, base + " lambda"))             # near-dup of A
    rows.append((7, base + " lambda"))             # exact dup of 6
    other = "one two three four five six seven eight nine ten " * 6
    rows.append((8, other))
    rows.append((9, other + " eleven"))            # near-dup of B
    for i in range(10, 20):                        # unique fillers
        rows.append((i, f"unique doc number {i} " + "x" * i))
    docs = spread(
        spark.createDataFrame(rows, "doc_id long, text string"), "doc_id"
    )

    # direct: verified pairs over ALL docs -> components
    direct_pairs = verified_near_dup_pairs(docs, persist_key="t.compose.direct")
    direct = {
        (r["doc_id"], r["component"])
        for r in connected_components_star(direct_pairs).collect()
    }

    # composed: pre-collapse -> rep components -> expand through mapping
    mapping, rep_pairs = near_dup_dedup(docs)
    rep_comp = connected_components_star(rep_pairs).withColumnRenamed(
        "doc_id", "rep_id"
    )
    composed_df = mapping.join(rep_comp, "rep_id", "left").select(
        "doc_id", F.coalesce("component", "rep_id").alias("component")
    )
    composed = {(r["doc_id"], r["component"]) for r in composed_df.collect()}

    # direct components only cover docs that appear in a pair; composed
    # covers everything — compare on the direct support, and singletons
    # (no pair anywhere) must map to their own exact-class rep
    direct_docs = {d for d, _ in direct}
    assert {t for t in composed if t[0] in direct_docs} == direct
    # docs outside the direct support are pair-free: their component must
    # be their exact-class representative (self for true singletons)
    rep_of = {r["doc_id"]: r["rep_id"] for r in mapping.collect()}
    assert all(c == rep_of[d] for d, c in composed if d not in direct_docs)
    # every doc is covered exactly once
    assert len(composed) == len(rows)
