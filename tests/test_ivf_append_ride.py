"""Persisted-index APPEND (r15): the ingest half of the maintained-index
lifecycle. The delta batch must (1) land in the cell-partitioned layout
exactly once (idempotent within a process), (2) be assigned to the
PERSISTED centroids — no Lloyd refit — with the health report read from
the layout alone (no embedding column in any ReadSchema), and (3) match
both the DuckDB oracle and the disk-free refit twin bit-for-bit.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from tests.parity import compare, fetch_df


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    from etl_active911_spark.operators.similarity import (
        _append_delta_pred,
        ivf_append_to_index,
        ivf_write_index2,
    )

    path = str(tmp_path_factory.mktemp("ivf2b") / "index")
    ivf_write_index2(
        spark, SF_ORACLE, path, row_filter=lambda: ~_append_delta_pred()
    )
    ivf_append_to_index(spark, SF_ORACLE, path)
    return path


def test_report_matches_oracle(spark, duck, index_path):
    from etl_active911_spark.operators.similarity import (
        _IVF_APPEND_ORACLE,
        ivf_layout_health_report,
    )

    problems = compare(
        ivf_layout_health_report(spark, index_path),
        fetch_df(duck, _IVF_APPEND_ORACLE),
    )
    assert problems == [], problems


def test_report_matches_refit_twin(spark, index_path):
    """Riding the appended layout == the disk-free refit twin, every
    column, every row (the abort-fallback path returns the same answer
    by construction — pin it)."""
    from etl_active911_spark.operators.similarity import (
        _append_report_refit,
        ivf_layout_health_report,
    )

    ride = {tuple(r) for r in ivf_layout_health_report(spark, index_path).collect()}
    refit = {tuple(r) for r in _append_report_refit(spark, SF_ORACLE).collect()}
    assert ride == refit
    assert len(ride) > 0


def test_registered_query_is_idempotent(spark):
    """Running the registered query twice in one process must NOT
    double-append the delta batch — the report is identical."""
    from etl_active911_spark.plans import registry

    registry.load_all()
    fn = registry.QUERIES["x3_ann_ivf_append_ride"]
    first = sorted(tuple(r) for r in fn(spark, SF_ORACLE).collect())
    second = sorted(tuple(r) for r in fn(spark, SF_ORACLE).collect())
    assert first == second
    assert len(first) > 0


def test_marker_crash_window_is_safe(spark):
    """Crash between a COMMITTED append job and the marker write: on
    retry the layout is the source of truth — deleting the marker and
    re-running the registered query must not double the batch."""
    import os
    import tempfile

    from etl_active911_spark.plans import registry

    registry.load_all()
    fn = registry.QUERIES["x3_ann_ivf_append_ride"]
    first = sorted(tuple(r) for r in fn(spark, SF_ORACLE).collect())
    marker = os.path.join(
        tempfile.gettempdir(),
        f"ivf_index2b_sf0.01_{os.getpid()}",
        "_delta_appended",
    )
    assert os.path.exists(marker), "registered query did not write its marker"
    os.remove(marker)
    replay = sorted(tuple(r) for r in fn(spark, SF_ORACLE).collect())
    assert replay == first
    assert os.path.exists(marker), "retry did not restore the marker"


def test_delta_rows_land_exactly_once(spark, index_path):
    """Layout integrity after the append: every delta vec_id appears in
    exactly one cell, base rows are untouched, and totals reconcile
    with the raw table's predicate counts."""
    from etl_active911_spark.io import read_table
    from etl_active911_spark.operators.similarity import _append_delta_pred

    emb = read_table(spark, SF_ORACLE, "embeddings")
    n_all = emb.count()
    n_delta = emb.filter(_append_delta_pred()).count()
    assert n_delta > 0, "delta slice empty — the append pin is vacuous"

    idx = spark.read.parquet(index_path)
    assert idx.count() == n_all
    per_vec = (
        idx.filter(_append_delta_pred())
        .groupBy("vec_id")
        .count()
        .filter(F.col("count") != 1)
        .count()
    )
    assert per_vec == 0
    assert idx.filter(_append_delta_pred()).count() == n_delta
    # the batch spreads over several cells (non-vacuity: a one-cell
    # delta would make the per-cell report trivially constant)
    n_cells = (
        idx.filter(_append_delta_pred()).select("cell").distinct().count()
    )
    assert n_cells >= 2


def test_report_plan_reads_layout_only(spark, index_path):
    """Plan evidence: the health report prunes the embedding payload
    column everywhere and never scans the raw embeddings parquet."""
    from etl_active911_spark.operators.similarity import ivf_layout_health_report

    plan = (
        ivf_layout_health_report(spark, index_path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for rs in re.findall(r"ReadSchema: ([^\n]*)", plan):
        assert "embedding" not in rs, rs
    assert "embeddings.parquet" not in plan, plan[:4000]


def test_report_flags_are_nonvacuous(spark, index_path):
    """The sf0.01 fixture exercises every report branch: at least one
    cell receives zero delta rows (mean_cos_delta = 0 path) and at
    least one cell's growth crosses the rebalance threshold."""
    from etl_active911_spark.operators.similarity import ivf_layout_health_report

    rows = ivf_layout_health_report(spark, index_path).collect()
    assert any(r["n_delta"] == 0 for r in rows)
    assert any(r["needs_rebalance"] == 1 for r in rows)
    assert any(r["n_delta"] > 0 and r["needs_rebalance"] == 0 for r in rows)


def test_appended_cos_is_stored_rounded(spark, index_path):
    """The appended rows carry the assignment window's own 6dp
    rounding, like the build job's rows — the property that keeps every
    layout consumer (reseed ride, health report) order-exact."""
    from etl_active911_spark.operators.similarity import _append_delta_pred

    bad = (
        spark.read.parquet(index_path)
        .filter(_append_delta_pred())
        .filter(F.col("cos") != F.round("cos", 6))
        .count()
    )
    assert bad == 0


def test_append_touches_only_assigned_cells(spark, tmp_path_factory):
    """The scale claim itself, file-level: after the append, every file
    that existed in the base layout is still there UNMODIFIED (same
    name, same size — nothing rewritten), cells that received no delta
    rows gained NO files, and every cell that did receive delta rows
    gained at least one."""
    import os

    from etl_active911_spark.operators.similarity import (
        _append_delta_pred,
        ivf_append_to_index,
        ivf_write_index2,
    )

    path = str(tmp_path_factory.mktemp("ivf2b_touch") / "index")
    ivf_write_index2(
        spark, SF_ORACLE, path, row_filter=lambda: ~_append_delta_pred()
    )

    def snapshot() -> dict[str, dict[str, int]]:
        cells: dict[str, dict[str, int]] = {}
        for d in os.listdir(path):
            full = os.path.join(path, d)
            if d.startswith("cell=") and os.path.isdir(full):
                cells[d] = {
                    f: os.path.getsize(os.path.join(full, f))
                    for f in os.listdir(full)
                    if not f.startswith((".", "_"))
                }
        return cells

    before = snapshot()
    ivf_append_to_index(spark, SF_ORACLE, path)
    after = snapshot()

    delta_cells = {
        f"cell={r['cell']}"
        for r in spark.read.parquet(path)
        .filter(_append_delta_pred())
        .select("cell")
        .distinct()
        .collect()
    }
    assert delta_cells, "no delta cells — the pin is vacuous"
    for cell, files in before.items():
        for f, size in files.items():
            assert after[cell].get(f) == size, f"{cell}/{f} was rewritten"
        gained = set(after[cell]) - set(files)
        if cell in delta_cells:
            assert gained, f"{cell} received delta rows but gained no files"
        else:
            assert not gained, f"{cell} got files without delta rows: {gained}"
