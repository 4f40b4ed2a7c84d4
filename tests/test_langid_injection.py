"""r13 (VERDICT r12 item 7): the multilingual injection makes the
language-ID heuristic non-degenerate — pins beside the degeneracy note in
textual.py (every pre-r13 doc argmaxed to 'en')."""

from __future__ import annotations

from etl_active911_spark.operators.textual import (
    LANGID_SAMPLES,
    STOPWORDS,
    x4_lang_id,
    x4_langid_confusion,
)
from tests.conftest import SF_ORACLE


def test_sample_sentence_margins():
    """Each sample sentence scores ≥ 11 native stopword hits per
    repetition and ≤ 4 hits against any OTHER language's list — the
    margin that guarantees argmax goes native on every injected row
    (max base-text en hits measured 14 at sf0.1; reps ≥ 2 → ≥ 22)."""
    for lang, sentence in LANGID_SAMPLES.items():
        toks = sentence.lower().split()
        native = sum(t in STOPWORDS[lang] for t in toks)
        assert native >= 11, (lang, native)
        for other, words in STOPWORDS.items():
            if other != lang:
                cross = sum(t in words for t in toks)
                assert cross <= 4, (lang, other, cross)


def test_confusion_matrix_is_non_degenerate(spark):
    """NON-VACUITY PIN (the verdict's ask: ≥ 2 languages actually
    predicted): every one of the 5 labeled languages appears as a
    PREDICTION at the oracle SF, and every label's diagonal cell exists
    (injected rows are correctly recalled)."""
    rows = x4_langid_confusion(spark, SF_ORACLE).collect()
    predicted = {r.predicted_lang for r in rows}
    assert predicted == set(STOPWORDS), predicted
    diagonal = {r.labeled_lang for r in rows if r.labeled_lang == r.predicted_lang}
    assert diagonal == set(STOPWORDS), diagonal


def test_injected_rows_predict_their_label(spark):
    """Every injected row (doc_id % 4 == 1) argmaxes to its labeled
    language — the margin proof made end-to-end."""
    rows = x4_lang_id(spark, SF_ORACLE).filter("doc_id % 4 = 1").collect()
    assert rows
    wrong = [r for r in rows if r.predicted_lang != r.labeled_lang]
    assert wrong == [], wrong[:5]


def test_non_injected_rows_keep_the_degenerate_baseline(spark):
    """Rows OFF the injection slice still argmax to 'en' (the documented
    degeneracy of the synthetic corpus) — the injection changes only its
    own slice, so the confusion matrix separates real recall (diagonal)
    from corpus degeneracy (the 'en' column)."""
    rows = x4_lang_id(spark, SF_ORACLE).filter("doc_id % 4 <> 1").collect()
    assert rows and all(r.predicted_lang == "en" for r in rows)
