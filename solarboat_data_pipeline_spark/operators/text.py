"""Text-analysis operators for large-scale training-data pipelines.

Everything here is pure native column expressions (no UDFs) built from a
deterministic md5-based 32-bit hash, so each operator has an exactly
mirrorable ANSI-SQL oracle (the paired SQL lives in ``driver_queries``).
Designed for 100 TB document tables: per-row expressions only — no
shuffles, no window sorts; whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword sets for the n-gram/stopword language-ID heuristic; deliberately
# tiny and deterministic (shared verbatim with the SQL oracle).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "en", "est", "que"),
    "de": ("der", "die", "und", "das", "ist", "ein", "zu", "den"),
}
DEFAULT_LANG = "und"


def h32(col: Column, salt: str = "") -> Column:
    """Deterministic 32-bit hash: first 8 hex chars of md5. Identical in
    DuckDB as ``('0x' || substr(md5(salt || x), 1, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 8), 16, 10).cast(
        "long"
    )


def tokens(text: Column) -> Column:
    """Lowercase whitespace tokens, empties removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def word_shingles(toks: Column, k: int = 3) -> Column:
    """Word k-grams (space-joined); empty array when fewer than k tokens."""
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(k)]
    )
    return F.when(F.size(toks) >= k, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword count: word-piece regex matches (runs of letters,
    digits, or single punctuation — a cheap proxy for tokenizer load)."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))


def quality_metrics(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals."""
    toks = tokens(text)
    n = F.size(toks)
    n_chars = F.length(text)
    punct = F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]"))
    all_stops = tuple(sorted({w for ws in LANG_STOPWORDS.values() for w in ws}))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*all_stops)))
    avg_word_len = F.when(
        n > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).cast("double")
        / n,
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n.cast("long"),
        "avg_word_len": F.round(avg_word_len, 6),
        "punct_ratio": F.round(
            F.when(n_chars > 0, punct.cast("double") / n_chars), 6
        ),
        "stopword_ratio": F.round(F.when(n > 0, n_stop.cast("double") / n), 6),
    }


def quality_filter(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    max_punct_ratio: float = 0.10,
    min_stopword_ratio: float = 0.01,
    max_repetition: float = 0.20,
) -> Column:
    """Gopher/C4-style composite quality gate as ONE boolean expression:
    word-count bounds, mean-word-length band, symbol-ratio cap, stopword
    floor (natural prose has function words), and 3-gram repetition cap
    (boilerplate/spam detector). All sub-signals are the already-verified
    scalar metrics, so the whole gate stays a per-row codegen expression —
    at 100 TB this runs inside the scan with zero shuffles and prunes the
    corpus before anything expensive touches it."""
    m = quality_metrics(text)
    # rounded like every quality_metrics signal, so thresholds behave
    # identically across engines (and the SQL oracle)
    rep = F.round(repetition_ratio_tokens(tokens(text)), 6)
    return (
        m["n_words"].between(min_words, max_words)
        & m["avg_word_len"].between(min_avg_word_len, max_avg_word_len)
        & (m["punct_ratio"] <= max_punct_ratio)
        & (m["stopword_ratio"] >= min_stopword_ratio)
        & (F.coalesce(rep, F.lit(0.0)) <= max_repetition)
    )


def lang_id(text: Column) -> Column:
    """Stopword-count language ID with deterministic tie-break (highest
    count wins; ties resolve in lexicographic language order)."""
    toks = tokens(text)
    counts = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*ws)))
        for lang, ws in sorted(LANG_STOPWORDS.items())
    }
    best = None
    best_lang = F.lit(DEFAULT_LANG)
    for lang in sorted(LANG_STOPWORDS):  # later langs must beat strictly
        c = counts[lang]
        if best is None:
            best = F.when(c > 0, c).otherwise(F.lit(None))
            best_lang = F.when(c > 0, F.lit(lang)).otherwise(F.lit(DEFAULT_LANG))
        else:
            better = c > F.coalesce(best, F.lit(0))
            best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
            best = F.when(better, c).otherwise(best)
    return best_lang


def repetition_ratio_tokens(toks: Column, k: int = 3) -> Column:
    """Duplicate word-k-gram fraction: 1 − |distinct shingles|/|shingles|.
    High values flag boilerplate/spam (a standard training-data quality
    signal). Null when the document has fewer than k tokens. Same
    materialized-tokens contract as :func:`fingerprint_tokens`."""
    sh = word_shingles(toks, k)
    n = F.size(sh)
    return F.when(
        n > 0, 1.0 - F.size(F.array_distinct(sh)).cast("double") / n
    )


def fingerprint_tokens(toks: Column) -> Column:
    """Key-collision fingerprint: md5 of the sorted distinct token set
    (OpenRefine-style normalization). Pass a MATERIALIZED token column
    (tokens aliased in their own projection) — inlining ``tokens(text)``
    here would re-evaluate the regex split per array reference."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))


def fingerprint(text: Column) -> Column:
    return fingerprint_tokens(tokens(text))


def rolling_min_hash_tokens(toks: Column, k: int = 3) -> Column:
    """Winnowing-style document fingerprint: minimum 32-bit hash over the
    word k-gram shingle set (= a 1-permutation MinHash). Same materialized-
    tokens contract as :func:`fingerprint_tokens`."""
    sh = word_shingles(toks, k)
    return F.when(F.size(sh) > 0, F.array_min(F.transform(sh, lambda s: h32(s))))


def rolling_min_hash(text: Column, k: int = 3) -> Column:
    return rolling_min_hash_tokens(tokens(text), k)


# PII-ish redaction patterns, applied in order. RE2-compatible (no
# backrefs/lookarounds) so the same pattern strings run verbatim in the
# JVM regex engine and the DuckDB oracle.
REDACT_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9][0-9 .-]{7,}[0-9]", "<PHONE>"),
    (r"[0-9]{6,}", "<NUM>"),
)


def model_score(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "score",
    batch_size_hint: int = 10_000,
    fake: bool = True,
):
    """Model-based quality scoring plumbing (perplexity / classifier
    filtering, the modern curation gate) via Arrow-batched ``mapInPandas``.

    The Spark-side contract is real — documents stream to the scorer in
    Arrow record batches, scores come back column-aligned, nothing leaves
    the executor — which is exactly how a small LM or fastText-style
    classifier runs at corpus scale (load the model once per task, score
    per batch).

    ``fake=False`` runs REAL inference: the built-in trained logistic
    quality model (:mod:`.quality_model` — in-repo gradient-descent
    weights over cross-engine-exact features; see its docstring for what
    it is and is not) and returns ``(id, logit, score, keep)`` where
    ``logit`` is bit-exact against the SQL oracle and ``keep = logit >
    0``. ``fake=True`` (default, kept for the legacy ``txt_model_score``
    row) scores with the deterministic byte-statistic stand-in (mean
    byte value / 255)."""
    from collections.abc import Iterator

    import pandas as pd

    if not fake:
        from solarboat_data_pipeline_spark.operators import quality_model

        schema_real = f"{id_col} long, logit double, {out_col} double, keep boolean"

        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # the model "loads" here, once per task — for the built-in
            # linear model that is just the frozen weights import
            for pdf in batches:
                z, p = quality_model.score_texts(list(pdf[text_col]))
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "logit": z,
                        out_col: p,
                        "keep": z > 0,
                    }
                )

        return df.select(id_col, text_col).mapInPandas(run_real, schema=schema_real)

    schema = f"{id_col} long, {out_col} double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scores = []
            for t in pdf[text_col]:
                b = t.encode("utf-8")
                scores.append(round(sum(b) / max(len(b), 1) / 255.0, 6))
            yield pd.DataFrame({id_col: pdf[id_col], out_col: scores})

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


def redact_pii(text: Column) -> Column:
    """Scrub email addresses, phone-shaped digit runs, and long numbers —
    the minimum PII pass a web-scale training corpus gets before the
    tokenizer. Pure chained ``regexp_replace`` (replace-all), whole-stage
    codegen, no shuffle: at 100 TB this fuses into the scan stage."""
    out = text
    for pat, repl in REDACT_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def ngram_topk(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level top-k word n-grams by TOTAL occurrences (with the
    containing-document count alongside) — the standard corpus-analysis
    pass for spotting boilerplate, templates, and vocabulary shape
    before/after dedup. Ties break on the gram itself so the result set
    is unique and engine-independent.

    100 TB shape: explode → ONE map-side-combined hash aggregate on the
    gram → global top-k, which Spark plans as TakeOrderedAndProject
    (per-partition heaps of k rows merged on the driver — no global
    sort, state O(k·partitions))."""
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    grams = toked.select(
        id_col, F.explode(word_shingles(F.col("__toks"))).alias("gram")
    )
    counts = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("occurrences"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    return counts.orderBy(F.col("occurrences").desc(), F.col("gram").asc()).limit(k)
