"""Pins for x5_audio_envelope_dedup (multimodal.py): the gain-invariance
and injectivity claims its docstring leans on, checked on the real
fixture rows — plus the perceptual-win assertion (the clusters digest
dedup cannot collapse actually occur at sf0.01)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_active911_spark.operators.multimodal import (
    audio_envelope_rows,
    media_table,
    x5_audio_envelope_dedup,
)
from tests.conftest import SF_ORACLE


def test_gain_invariance_and_injectivity(spark):
    """Same waveform group ⇒ same fingerprint at EVERY gain (the
    perceptual collapse); distinct (group, gain) ⇒ distinct payload
    bytes (the injectivity the oracle's n_byte_classes stands on)."""
    rows = audio_envelope_rows(media_table(spark, SF_ORACLE)).collect()
    assert rows, "no audio assets at sf0.01"
    by_group: dict[int, set[tuple[int, int]]] = {}
    by_class: dict[tuple[int, int], set[str]] = {}
    gains_seen: dict[int, set[int]] = {}
    for r in rows:
        g = r.doc_id % 7
        gain = (1, 2, 4)[(r.doc_id // 21) % 3]
        by_group.setdefault(g, set()).add((r.n_frames, r.fingerprint_code))
        by_class.setdefault((g, gain), set()).add(r.payload_sha)
        gains_seen.setdefault(g, set()).add(gain)
    # gain-invariance: one fingerprint per waveform group
    for g, fps in by_group.items():
        assert len(fps) == 1, f"group {g}: fingerprints diverge across gains: {fps}"
    # the invariance is exercised, not vacuous: some group carries >1 gain
    assert any(len(v) >= 2 for v in gains_seen.values())
    # injectivity: one payload digest per (group, gain) class, and
    # different classes never share a digest
    all_shas = [sha for shas in by_class.values() for sha in shas]
    for key, shas in by_class.items():
        assert len(shas) == 1, f"class {key}: multiple payload digests"
    assert len(set(all_shas)) == len(by_class)


def test_perceptual_win_clusters_exist(spark):
    """At sf0.01 the report must contain clusters with n_byte_classes >= 2
    (byte-distinct re-masters only the envelope fingerprint collapses)
    AND clusters with n_assets > n_byte_classes (byte-identical copies),
    and cluster membership must conserve assets."""
    out = x5_audio_envelope_dedup(spark, SF_ORACLE).collect()
    assert any(r.n_byte_classes >= 2 for r in out)
    assert any(r.n_assets > r.n_byte_classes for r in out)
    for r in out:
        assert r.n_assets >= r.n_byte_classes >= 1
        assert r.rep_doc % 3 == 1  # audio slice only


def test_fingerprint_separates_waveforms(spark):
    """Different waveform groups with the SAME frame count do not all
    collapse to one fingerprint — the code carries signal, not just
    length (groups 0/1 and 5/6 share n_frames)."""
    rows = audio_envelope_rows(media_table(spark, SF_ORACLE)).collect()
    codes_by_frames: dict[int, set[int]] = {}
    for r in rows:
        codes_by_frames.setdefault(r.n_frames, set()).add(r.fingerprint_code)
    assert any(len(v) >= 2 for v in codes_by_frames.values())
