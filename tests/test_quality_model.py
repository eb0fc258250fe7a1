"""The built-in trained quality model (operators/quality_model.py):
sanity of the learned decision, exactness properties the oracle gate
relies on, and the real-inference path through model_score."""

from __future__ import annotations

import numpy as np

from solarboat_data_pipeline_spark.operators import quality_model as qm

CLEAN = (
    "the query planner pushed the filter into the scan and the join "
    "ran as a broadcast so the batch finished fast for the customer."
)
SPAM_REPEAT = "buy buy buy buy buy buy buy buy buy buy buy buy buy buy"
SPAM_DIGITS = "84613970-221 00518203-407 66660123-987 10293847-555 87654321-000"
SPAM_PUNCT = "win!!! free!!! offer!!! click!!! now!!! $$$ !!! $$$ !!!"


def test_learned_decision_separates_spam_shapes():
    z_clean = qm.logit(CLEAN)
    for spam in (SPAM_REPEAT, SPAM_DIGITS, SPAM_PUNCT):
        assert qm.logit(spam) < z_clean
    assert z_clean > 0
    assert qm.logit(SPAM_REPEAT) < 0
    assert qm.logit(SPAM_DIGITS) < 0


def test_empty_and_whitespace_texts_are_finite():
    for t in ("", "   ", "\t\n"):
        assert np.isfinite(qm.logit(t))
    # empty string: every feature is zero -> logit is exactly the bias
    assert qm.logit("") == qm.BIAS


def test_features_are_count_ratios_only():
    # every feature must be reproducible from integer counts alone —
    # the property that makes the SQL oracle bit-exact
    t = "The quick brown fox!! 123 jumps over the lazy dog 456."
    f = qm.features(t)
    toks = [x for x in t.lower().split() if x]
    n_chars, n_words = len(t), len(toks)
    assert f[0] == n_chars / 1000.0
    assert f[1] == n_words / 100.0
    assert f[2] == (sum(len(x) for x in toks) / n_words) / 10.0
    assert f[5] == sum(1 for x in toks if x in qm._ALL_STOPS) / n_words
    assert f[6] == 1.0 - len(set(toks)) / n_words


def test_fixed_order_dot_product_matches_manual():
    x = qm.features(CLEAN)
    z = qm.BIAS
    for w, xi in zip(qm.WEIGHTS, x):
        z = z + w * xi
    assert qm.logit(CLEAN) == z  # bitwise, not approx


def test_score_texts_batch_matches_scalar():
    texts = [CLEAN, SPAM_REPEAT, "", SPAM_DIGITS]
    z, p = qm.score_texts(texts)
    assert list(z) == [qm.logit(t) for t in texts]
    np.testing.assert_allclose(p, 1.0 / (1.0 + np.exp(-z)))
    assert ((z > 0) == (p > 0.5)).all()


def test_model_score_real_path(spark):
    from solarboat_data_pipeline_spark.operators import text as tx

    df = spark.createDataFrame(
        [(0, CLEAN), (1, SPAM_REPEAT), (2, SPAM_PUNCT)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r for r in tx.model_score(df, fake=False).collect()
    }
    assert got[0]["keep"] and not got[1]["keep"]
    assert got[0]["logit"] == qm.logit(CLEAN)  # bitwise through Arrow
    assert abs(got[0]["score"] - 1 / (1 + np.exp(-qm.logit(CLEAN)))) < 1e-12
