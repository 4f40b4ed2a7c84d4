"""Multi-probe LSH dominance: the T=1 probe set strictly contains the
single-probe buckets, so for every query the rank-j cosine of
``x3_ann_lsh_multiprobe`` must be >= ``x3_ann_lsh``'s rank-j cosine
(candidate-superset => the sorted top-k prefix dominates pointwise)."""

from etl_active911_spark.plans import registry

SF = "/root/testdata/sf0.001"


def test_multiprobe_dominates_single_probe(spark):
    registry.load_all()
    lsh = {
        (r["query_id"], r["rnk"]): r["cosine"]
        for r in registry.QUERIES["x3_ann_lsh"](spark, SF).collect()
    }
    mp = {
        (r["query_id"], r["rnk"]): r["cosine"]
        for r in registry.QUERIES["x3_ann_lsh_multiprobe"](spark, SF).collect()
    }
    assert mp, "multiprobe returned no rows"
    # every (query, rank) single-probe produced must exist in multiprobe
    # with at-least-equal cosine
    for key, cos in lsh.items():
        assert key in mp, f"multiprobe lost rank slot {key}"
        assert mp[key] >= cos, f"{key}: multiprobe {mp[key]} < single {cos}"
    # and multiprobe must have found at least as many ranked slots
    assert len(mp) >= len(lsh)
