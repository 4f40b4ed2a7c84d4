"""bench.py is driver-run per round — a typo'd HEADLINE name would crash
the round's bench record. Pin the list's integrity against the registry."""

from __future__ import annotations

import bench
from etl_active911_spark.plans import registry

registry.load_all()


def test_headline_names_registered():
    missing = [n for n in bench.HEADLINE if n not in registry.QUERIES]
    assert not missing, f"HEADLINE names not in registry: {missing}"


def test_headline_no_duplicates():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_anchor_set_is_headline_prefix():
    """The frozen 2x-gate anchors must stay the first 17 HEADLINE entries
    (ANCHOR_17 is derived positionally) and each must have a frozen
    denominator."""
    assert set(bench.HEADLINE[:17]) == set(bench.ANCHOR_SECONDS)
    assert bench.ANCHOR_17 == set(bench.ANCHOR_SECONDS)
