"""x2_lsh_recall_eval ground-truth df-cut (VERDICT r09 item 2).

Three contracts:
1. the cap ENGAGES on synthetic flood data (a shingle shared by > cap
   docs produces zero truth pairs through the capped path);
2. rare-shingle pairs still surface exactly (full-set-size Jaccard);
3. the cap is a NO-OP at the driver's oracle scale — max shingle df at
   sf0.01 is far below the cap, so the oracle hash is unchanged
   (executable headroom pin, not a docstring claim).
"""

from __future__ import annotations

import duckdb

from etl_active911_spark.operators.dedup import (
    LSH_TRUTH_DF_CAP,
    lsh_truth_pairs,
)
from tests.conftest import SF_ORACLE


def _truth(spark, rows, df_cap):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.doc_a, r.doc_b): r.jac
        for r in lsh_truth_pairs(df, df_cap=df_cap).collect()
    }


def test_cap_engages_on_flood_shingle(spark):
    # 70 docs all equal to one 3-word text: one shingle with df=70 > 64.
    rows = [(i, "alpha beta gamma") for i in range(70)]
    assert _truth(spark, rows, LSH_TRUTH_DF_CAP) == {}
    # Sanity: with the cap lifted the same data yields all 70*69/2 pairs.
    uncapped = _truth(spark, rows, 1 << 30)
    assert len(uncapped) == 70 * 69 // 2
    assert all(j == 1.0 for j in uncapped.values())


def test_rare_pairs_survive_alongside_flood(spark):
    # The flood shingle is capped out, but a rare duplicated pair whose
    # shingles are unique to it must still be found with exact Jaccard.
    rows = [(i, "alpha beta gamma") for i in range(70)]
    rows += [
        (100, "delta epsilon zeta eta"),
        (101, "delta epsilon zeta eta"),
    ]
    got = _truth(spark, rows, LSH_TRUTH_DF_CAP)
    assert set(got) == {(100, 101)}
    assert got[(100, 101)] == 1.0


def test_partial_overlap_jaccard_uses_full_set_sizes(spark):
    # doc 0: shingles {a b c, b c d}; doc 1: {a b c, b c x} -> jac = 1/3.
    rows = [(0, "a b c d"), (1, "a b c x")]
    got = _truth(spark, rows, LSH_TRUTH_DF_CAP)
    assert set(got) == set()  # 1/3 < 0.5 threshold
    # and two docs sharing 2 of 3 shingles: jac = 2/4 = 0.5 passes.
    rows = [(0, "a b c d e"), (1, "a b c d x")]
    got = _truth(spark, rows, LSH_TRUTH_DF_CAP)
    assert got == {(0, 1): 0.5}


def test_cap_is_noop_at_oracle_scale():
    """Max shingle document frequency at sf0.01 must sit well under the
    cap, so the driver's oracle comparison never sees the cut engage."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/documents.parquet')"
    )
    (max_df,) = con.execute(
        """
        WITH toks AS (
            SELECT doc_id,
                   string_split(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g')), ' ') AS t
            FROM documents),
        sh AS (
            SELECT doc_id, CASE WHEN len(t) >= 3
                   THEN list_distinct(list_transform(generate_series(1, len(t) - 2),
                                                     i -> array_to_string(t[i:i+2], ' ')))
                   ELSE [array_to_string(t, ' ')] END AS gs FROM toks),
        p AS (SELECT doc_id, UNNEST(gs) AS g FROM sh)
        SELECT MAX(cnt) FROM (SELECT g, COUNT(*) AS cnt FROM p GROUP BY g)
        """
    ).fetchone()
    con.close()
    # measured 7 at sf0.01 (25 at sf0.1); require 2x headroom under the cap
    assert max_df * 2 <= LSH_TRUTH_DF_CAP, max_df
