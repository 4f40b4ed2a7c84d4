"""Shared text-pattern constants (leaf module — no operator imports).

Lives below the operator layer so both ``operators.textual`` and
``operators.dedup`` can use the tokenizer regex at DECORATION time
without a circular import (their ``@query`` oracle builders run at
module import, and each module's oracles reference the other's CTEs).
"""

# BPE-ish pre-tokenization regex (GPT-2-style shape: contractions, letter
# runs, digit runs, punctuation runs, whitespace runs) restricted to the
# RE2∩Java-regex common subset so Spark and DuckDB tokenize identically
# (value-level extraction equality verified, not just counts).
BPE_ISH_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"

# PII patterns (X-4k) — conservative regex subset (character classes,
# bounded repeats — no lookaround, no \d shorthands) so Java regex and
# RE2 agree byte-for-byte. Hoisted here (r12) so clustering's
# release-scorecard oracle builder can embed them at decoration time
# without a circular import (the BPE_ISH_PATTERN precedent above).
PII_EMAIL = "[A-Za-z0-9._]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
PII_PHONE = "\\+1-555-[0-9][0-9][0-9][0-9]"
PII_SSN = "[0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9][0-9][0-9]"
#: a document matching at least this many PII instances is quarantined
PII_QUARANTINE_MIN = 2


def pii_aug_cte() -> str:
    """The PII injection CTE (``aug``): deterministic synthetic PII
    appended as a function of doc_id, identical in both engines — the
    SINGLE source nested by x4_pii_redact, x4_pii_gate, and
    x9_release_scorecard's oracle so the injection can never fork
    (the component_ctes discipline). Spark-side twin:
    ``textual.pii_verdict_rows``."""
    return """
    aug AS (
        SELECT doc_id, source,
               text
               || CASE WHEN doc_id % 3 <> 0
                       THEN ' contact user' || CAST(doc_id AS STRING) || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 2 = 0
                       THEN ' call +1-555-' || LPAD(CAST(doc_id % 10000 AS STRING), 4, '0')
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN ' ssn 987-65-' || LPAD(CAST(doc_id % 10000 AS STRING), 4, '0')
                       ELSE '' END AS aug
        FROM documents
    )"""


def pii_n_matches_sql(col: str, pattern: str) -> str:
    """Split-based PII match count (matches = separators), shared SQL
    text for the same three oracles."""
    return f"CAST(len(string_split_regex({col}, '{pattern}')) - 1 AS BIGINT)"

def pii_n_matches_col(col, pattern: str):
    """Spark Column twin of ``pii_n_matches_sql`` (split-based: matches =
    separators − 1) — the SINGLE Spark-side counting convention, consumed
    by ``textual.pii_verdict_rows`` and the composed ingest funnel so the
    gate and the funnel can never drift (r13 review finding)."""
    from pyspark.sql import functions as F

    return (F.size(F.split(col, pattern)) - 1).cast("bigint")


def pii_total_matches_col(col):
    """Total PII matches (email + phone + ssn) in a text Column."""
    out = None
    for pat in (PII_EMAIL, PII_PHONE, PII_SSN):
        m = pii_n_matches_col(col, pat)
        out = m if out is None else out + m
    return out
