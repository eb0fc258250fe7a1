#!/usr/bin/env python
"""Train (and freeze) the tiny built-in document-quality model used by
``operators/quality_model.py`` — a logistic regression over the exact
cross-engine feature set, trained on a deterministic synthetic corpus of
clean prose vs spam shapes. Run it to reproduce the frozen weights:

    python scripts/train_quality_model.py

The model is deliberately tiny and fully in-repo: no external data, no
model files, reproducible from the fixed seed. It is a REAL trained
model with real inference — not a pretrained LLM quality scorer; the
README says this plainly. Printing accuracy on a held-out split guards
against a degenerate fit.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solarboat_data_pipeline_spark.operators.quality_model import (  # noqa: E402
    FEATURE_NAMES,
    features,
)

SEED = 20260814
N_PER_CLASS = 4000

VOCAB = (
    "table row scan filter join merge sort hash group window batch stream "
    "query column value data key part order line small big fast slow spark "
    "vector agg customer"
).split()
STOPS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]
SPAM_TOKENS = ["buy", "click", "free", "win", "$$$", "!!!", "offer", "now"]


def gen_good(rng: np.random.Generator) -> str:
    n = int(rng.integers(25, 180))
    words = []
    for _ in range(n):
        if rng.random() < 0.25:
            words.append(STOPS[int(rng.integers(0, len(STOPS)))])
        else:
            words.append(VOCAB[int(rng.integers(0, len(VOCAB)))])
    # sentence punctuation every ~12 words
    out = []
    for i, w in enumerate(words):
        out.append(w)
        if i % 12 == 11:
            out[-1] += "."
    return " ".join(out)


def gen_spam(rng: np.random.Generator) -> str:
    kind = int(rng.integers(0, 4))
    if kind == 0:  # one token repeated
        w = SPAM_TOKENS[int(rng.integers(0, len(SPAM_TOKENS)))]
        return " ".join([w] * int(rng.integers(20, 120)))
    if kind == 1:  # digit / promo-code soup
        return " ".join(
            f"{int(rng.integers(0, 10 ** 8)):08d}-{int(rng.integers(0, 999)):03d}"
            for _ in range(int(rng.integers(15, 60)))
        )
    if kind == 2:  # punctuation storm
        return " ".join(
            SPAM_TOKENS[int(rng.integers(0, len(SPAM_TOKENS)))]
            + "!!!" * int(rng.integers(1, 4))
            for _ in range(int(rng.integers(10, 50)))
        )
    # near-empty fragments
    return " ".join(
        VOCAB[int(rng.integers(0, len(VOCAB)))] for _ in range(int(rng.integers(1, 4)))
    )


def main() -> None:
    rng = np.random.default_rng(SEED)
    texts = [gen_good(rng) for _ in range(N_PER_CLASS)] + [
        gen_spam(rng) for _ in range(N_PER_CLASS)
    ]
    y = np.array([1.0] * N_PER_CLASS + [0.0] * N_PER_CLASS)
    X = np.array([features(t) for t in texts])

    idx = rng.permutation(len(y))
    X, y = X[idx], y[idx]
    n_train = int(0.8 * len(y))
    Xtr, ytr, Xte, yte = X[:n_train], y[:n_train], X[n_train:], y[n_train:]

    w = np.zeros(X.shape[1])
    b = 0.0
    lr = 0.5
    for _ in range(3000):
        z = Xtr @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - ytr
        w -= lr * (Xtr.T @ g) / len(ytr)
        b -= lr * g.mean()

    def acc(Xs, ys):
        return float((((Xs @ w + b) > 0) == (ys > 0.5)).mean())

    print(f"train acc: {acc(Xtr, ytr):.4f}   heldout acc: {acc(Xte, yte):.4f}")
    print("\n# frozen weights for operators/quality_model.py:")
    print(f"BIAS = {b!r}")
    print("WEIGHTS = (")
    for name, wi in zip(FEATURE_NAMES, w):
        print(f"    {wi!r},  # {name}")
    print(")")


if __name__ == "__main__":
    main()
