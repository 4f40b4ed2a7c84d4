"""x5_phash_banded_dedup contracts (VERDICT r09 item 5a).

1. Pigeonhole recall floor: banding the 4 16-bit quarters finds EVERY
   pair within Hamming ≤ 3 (3 flips cannot touch all 4 bands), with the
   exact all-pairs Hamming set as reference.
2. Flood cap engages: a band value shared by > PHASH_MAX_BUCKET classes
   produces no candidates; lifting the cap on the same data does.
3. Exact-dup classes surface as self-pair rows at class grain.
"""

from __future__ import annotations

import random

from etl_active911_spark.operators.multimodal import (
    PHASH_MAX_BUCKET,
    PHASH_NEAR_HAMMING,
    phash_banded_pairs,
)

SCHEMA = "doc_id long, width int, height int, h0 long, h1 long"
M32 = (1 << 32) - 1


def _hashes(spark, rows):
    return spark.createDataFrame([(i, 8, 8, h0, h1) for i, h0, h1 in rows], SCHEMA)


def _ham(a, b):
    return bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")


def test_recall_floor_hamming_le_3(spark):
    rng = random.Random(17)
    rows = []
    hs = {}
    doc = 0
    for _ in range(10):
        h0, h1 = rng.getrandbits(32), rng.getrandbits(32)
        for flips in (0, 1, 2, 3):
            v0, v1 = h0, h1
            for bit in rng.sample(range(64), flips):
                if bit < 32:
                    v0 ^= 1 << bit
                else:
                    v1 ^= 1 << (bit - 32)
            rows.append((doc, v0, v1))
            hs[doc] = (v0, v1)
            doc += 1
    out = phash_banded_pairs(_hashes(spark, rows)).collect()
    got = {(r.rep_a, r.rep_b): r.hamming for r in out if r.rep_a != r.rep_b}
    # exact all-pairs reference (only classes: dedup identical hashes)
    reps = {}
    for i, h in sorted(hs.items()):
        reps.setdefault(h, i)
    classes = sorted(reps.items(), key=lambda kv: kv[1])
    exact3 = {}
    for i, (ha, ra) in enumerate(classes):
        for hb, rb in classes[i + 1:]:
            d = _ham(ha, hb)
            if d <= 3:
                exact3[(min(ra, rb), max(ra, rb))] = d
    assert exact3, "degenerate test: no near pairs generated"
    # recall floor: every exact pair ≤ 3 is found, with the right distance
    for pair, d in exact3.items():
        assert got.get(pair) == d, (pair, d, got.get(pair))
    # soundness: everything reported is within the threshold and correct
    rep_hash = {r: h for h, r in reps.items()}
    for (a, b), d in got.items():
        assert d <= PHASH_NEAR_HAMMING
        assert _ham(rep_hash[a], rep_hash[b]) == d


def test_flood_cap_engages(spark):
    # PHASH_MAX_BUCKET+2 classes share ONLY band 0 (low h0 quarter = 42);
    # every other quarter is distinct per class, so dropping the flooded
    # bucket removes all candidates. Lifting the cap re-admits the many
    # genuinely-near pairs among them.
    n = PHASH_MAX_BUCKET + 2
    rows = [
        (i, 42 | ((i + 1) << 16), (4000 + i) | ((2 * i + 1) << 16))
        for i in range(n)
    ]
    df = _hashes(spark, rows)
    capped = phash_banded_pairs(df).collect()
    assert capped == []
    lifted = phash_banded_pairs(df, max_bucket=1 << 20).collect()
    assert any(r.rep_a != r.rep_b for r in lifted)


def test_exact_classes_emit_self_rows(spark):
    rows = [(1, 7, 9), (2, 7, 9), (3, 7, 9), (4, M32, M32)]
    out = phash_banded_pairs(_hashes(spark, rows)).collect()
    selfs = [r for r in out if r.rep_a == r.rep_b]
    assert [(r.rep_a, r.n_docs_a, r.hamming) for r in selfs] == [(1, 3, 0)]
