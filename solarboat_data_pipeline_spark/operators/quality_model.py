"""Built-in trained document-quality model: a tiny logistic regression
over cross-engine-exact text features.

This makes ``text.model_score(fake=False)`` REAL inference: a model
with weights learned by gradient descent (``scripts/
train_quality_model.py`` — deterministic synthetic corpus of clean
prose vs four spam shapes, seed-pinned, held-out accuracy printed at
training time and asserted in tests). It is deliberately tiny and
fully in-repo — a linear classifier over engineered features, the
fastText-style shape of real corpus-quality gates — NOT a pretrained
LLM scorer; swapping a heavyweight model into the same Arrow
``mapInPandas`` contract changes nothing else.

Every feature is an integer count or a ratio of integer counts
(IEEE-754 division is exactly specified, no libm), the token/stopword/
punctuation definitions mirror :func:`text.quality_metrics`, and the
logit is a FIXED-ORDER dot product — so Spark's Python worker and the
DuckDB oracle produce bit-identical doubles and the
``txt_model_score_real`` driver row is an exact hash gate, no rounding
grid needed. One deliberate difference from ``quality_metrics``: the
whitespace class is the EXPLICIT ``[ \\t\\n\\x0b\\f\\r]`` set, not an
engine ``\\s`` — Python's ``\\s`` (even ASCII-flagged), Java's ``\\s``
and RE2's ``\\s`` disagree on VT and Unicode spaces (RE2 does not
split on ``\\x0b``; none split NBSP but Python ``str.split`` does), so
only an explicit class keeps real-world web text (NBSP is ubiquitous)
bit-exact across all three.
"""

from __future__ import annotations

import re

import numpy as np

from solarboat_data_pipeline_spark.operators.text import LANG_STOPWORDS

#: the explicit cross-engine whitespace class (see module docstring)
WS_CLASS = " \t\n\x0b\f\r"

FEATURE_NAMES = (
    "n_chars_k",        # length(text) / 1000
    "n_words_h",        # token count / 100
    "avg_word_len_d",   # mean token length / 10
    "punct_ratio",      # non-alnum-non-ws count / n_chars
    "digit_ratio",      # [0-9] count / n_chars
    "stopword_ratio",   # stopword tokens / n_words
    "repetition",       # 1 - distinct tokens / n_words
)

_ALL_STOPS = frozenset(w for ws in LANG_STOPWORDS.values() for w in ws)
_WS_SPLIT = re.compile(f"[{WS_CLASS}]+")
_PUNCT = re.compile(f"[^A-Za-z0-9{WS_CLASS}]")
_DIGIT = re.compile(r"[0-9]")

# frozen by scripts/train_quality_model.py (seed 20260814, 8000 docs,
# 3000 GD steps; train acc 0.9792, heldout acc 0.9825). The signs are
# what a corpus-quality intuition predicts: stopword density and length
# up-weight, repetition / digit soup / punctuation storms down-weight.
BIAS = 0.3068665119190681
WEIGHTS = (
    2.80606163713599,       # n_chars_k
    6.577606692372091,      # n_words_h
    -4.537727903989675,     # avg_word_len_d
    -3.6124532380144614,    # punct_ratio
    -4.536425579897039,     # digit_ratio
    12.638835643560652,     # stopword_ratio
    -7.224485228622998,     # repetition
)


def features(text: str) -> list[float]:
    """The 7 features, computed EXACTLY as the SQL oracle computes them:
    integer counts and count ratios only, tokens = lowercase split on
    the explicit ``WS_CLASS`` (NOT ``str.split()`` — see module
    docstring), zero when the denominator is 0."""
    toks = [t for t in _WS_SPLIT.split(text.lower()) if t]
    n_chars = len(text)
    n_words = len(toks)
    sum_len = sum(len(t) for t in toks)
    n_punct = len(_PUNCT.findall(text))
    n_digit = len(_DIGIT.findall(text))
    n_stop = sum(1 for t in toks if t in _ALL_STOPS)
    n_distinct = len(set(toks))
    return [
        n_chars / 1000.0,
        n_words / 100.0,
        (sum_len / n_words) / 10.0 if n_words else 0.0,
        n_punct / n_chars if n_chars else 0.0,
        n_digit / n_chars if n_chars else 0.0,
        n_stop / n_words if n_words else 0.0,
        1.0 - n_distinct / n_words if n_words else 0.0,
    ]


def logit(text: str) -> float:
    """Fixed-order dot product — the SQL oracle spells out the identical
    ``((bias + w1*f1) + w2*f2) + ...`` association, so both engines run
    the exact same IEEE-754 operation sequence."""
    x = features(text)
    z = BIAS
    for w, xi in zip(WEIGHTS, x):
        z = z + w * xi
    return z


def score_texts(texts) -> tuple[np.ndarray, np.ndarray]:
    """Batch inference: (logit, probability) arrays. The probability
    goes through libm ``exp`` and is for consumers, not for the exact
    oracle gate (which checks the logit and the sign)."""
    z = np.array([logit(t) for t in texts])
    return z, 1.0 / (1.0 + np.exp(-z))
