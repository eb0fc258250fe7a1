"""Text-analysis driver queries (quality, langid, tokens, fingerprints, decontamination, quality-model scoring, redaction).

Split out of driver_queries.py (round 9); conventions in the facade
docstring there.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators import dedup as dd
from solarboat_data_pipeline_spark.operators import text as tx

from solarboat_data_pipeline_spark.driver._registry import (  # noqa: F401
    SQL_TOKENS,
    _SQL_SH,
    _SQL_TOKS,
    _sql_lsh_pairs,
    _t,
    register,
    sql_h32,
    sql_shingles,
)



def _sql_langid() -> str:
    counts = {
        lang: f"len(list_filter(toks, t -> list_contains({list(ws)!r}, t)))"
        for lang, ws in sorted(tx.LANG_STOPWORDS.items())
    }
    # fold exactly like the Spark side: first language with count>0 seeds,
    # later languages win only on strictly greater counts
    langs = sorted(tx.LANG_STOPWORDS)
    expr_lang = f"CASE WHEN c_{langs[0]} > 0 THEN '{langs[0]}' ELSE '{tx.DEFAULT_LANG}' END"
    expr_best = f"CASE WHEN c_{langs[0]} > 0 THEN c_{langs[0]} END"
    for lang in langs[1:]:
        expr_lang = (
            f"CASE WHEN c_{lang} > coalesce({expr_best}, 0) THEN '{lang}' "
            f"ELSE {expr_lang} END"
        )
        expr_best = (
            f"CASE WHEN c_{lang} > coalesce({expr_best}, 0) THEN c_{lang} "
            f"ELSE {expr_best} END"
        )
    selects = ", ".join(f"{c} AS c_{lang}" for lang, c in counts.items())
    return f"""
    WITH t AS (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents),
         c AS (SELECT doc_id, lang, {selects} FROM t)
    SELECT doc_id, lang AS actual_lang, {expr_lang} AS pred_lang FROM c
    """


@register("txt_langid", _sql_langid())
def txt_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        tx.lang_id(F.col("text")).alias("pred_lang"),
    )


@register(
    "txt_quality",
    f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents)
    SELECT doc_id,
           length(text)::BIGINT AS n_chars,
           len(toks)::BIGINT AS n_words,
           round(CASE WHEN len(toks) > 0 THEN
             list_sum(list_transform(toks, t -> length(t))) * 1.0 / len(toks) END,
             6) AS avg_word_len,
           round(CASE WHEN length(text) > 0 THEN
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0 / length(text) END,
             6) AS punct_ratio,
           round(CASE WHEN len(toks) > 0 THEN
             len(list_filter(toks, t -> list_contains({sorted({w for ws in tx.LANG_STOPWORDS.values() for w in ws})!r}, t))) * 1.0 / len(toks) END,
             6) AS stopword_ratio
    FROM t
    """,
)
def txt_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    metrics = tx.quality_metrics(F.col("text"))
    return docs.select(
        "doc_id", *[metrics[k].alias(k) for k in
                    ("n_chars", "n_words", "avg_word_len", "punct_ratio", "stopword_ratio")]
    )


@register(
    "txt_quality_filter",
    f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents),
         s AS (SELECT doc_id, text, toks, {_SQL_SH} AS sh FROM t),
         m AS (SELECT doc_id,
                 len(toks)::BIGINT AS n_words,
                 round(CASE WHEN len(toks) > 0 THEN
                   list_sum(list_transform(toks, t -> length(t))) * 1.0 / len(toks)
                 END, 6) AS awl,
                 round(CASE WHEN length(text) > 0 THEN
                   len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0 / length(text)
                 END, 6) AS pr,
                 round(CASE WHEN len(toks) > 0 THEN
                   len(list_filter(toks, t -> list_contains({sorted({w for ws in tx.LANG_STOPWORDS.values() for w in ws})!r}, t))) * 1.0 / len(toks)
                 END, 6) AS sr,
                 round(CASE WHEN len(sh) > 0 THEN
                   1.0 - len(list_distinct(sh)) * 1.0 / len(sh) END, 6) AS rep
           FROM s)
    SELECT doc_id, n_words FROM m
    WHERE n_words BETWEEN 30 AND 100000
      AND awl BETWEEN 3.0 AND 5.0
      AND pr <= 0.1 AND sr >= 0.02 AND coalesce(rep, 0) <= 0.2
    """,
)
def txt_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style composite quality gate
    (operators/text.py:quality_filter): one per-row codegen boolean over
    the verified scalar metrics — at scale it prunes in the scan stage."""
    docs = _t(spark, sf_dir, "documents")
    kept = docs.where(
        tx.quality_filter(
            F.col("text"),
            min_words=30,
            max_words=100_000,
            min_avg_word_len=3.0,
            max_avg_word_len=5.0,
            max_punct_ratio=0.1,
            min_stopword_ratio=0.02,
            max_repetition=0.2,
        )
    )
    return kept.select(
        "doc_id", tx.token_count(F.col("text")).cast("long").alias("n_words")
    )


@register(
    "txt_ngram_topk",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
         s AS (SELECT doc_id, unnest({_SQL_SH}) AS gram FROM t)
    SELECT gram,
           count(*)::BIGINT AS occurrences,
           count(DISTINCT doc_id)::BIGINT AS n_docs
    FROM s
    GROUP BY gram
    ORDER BY occurrences DESC, gram ASC
    LIMIT 50
    """,
)
def txt_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-50 word 3-grams by total occurrences with containing-doc
    counts (operators/text.py:ngram_topk — round 7): the standard
    corpus-analysis pass for boilerplate/template spotting. One
    map-side-combined hash aggregate on the gram, then a global top-k
    that Spark plans as TakeOrderedAndProject (per-partition k-row
    heaps, no global sort); ties break on the gram so the row set is
    engine-independent."""
    out = tx.ngram_topk(_t(spark, sf_dir, "documents"), k=50)
    return out.select(
        "gram",
        F.col("occurrences").cast("long").alias("occurrences"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


@register(
    "txt_tokens",
    f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents)
    SELECT doc_id,
           len(toks)::BIGINT AS n_tokens,
           len(list_distinct(toks))::BIGINT AS n_unique,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))::BIGINT AS n_bpe_ish
    FROM t
    """,
)
def txt_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        tx.bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_ish"),
    )


@register(
    "txt_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
         s AS (SELECT doc_id, toks, {_SQL_SH} AS sh FROM t)
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint,
           CASE WHEN len(sh) > 0 THEN
             list_min(list_transform(sh, s -> {sql_h32('s')}))::BIGINT
           END AS rolling_min_hash
    FROM s
    """,
)
def txt_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tx.tokens(F.col("text")).alias("__toks"))
    return toked.select(
        "doc_id",
        tx.fingerprint_tokens(F.col("__toks")).alias("fingerprint"),
        tx.rolling_min_hash_tokens(F.col("__toks")).alias("rolling_min_hash"),
    )


@register(
    "txt_repetition",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
         s AS (SELECT doc_id, {_SQL_SH} AS sh FROM t)
    SELECT doc_id,
           round(CASE WHEN len(sh) > 0 THEN
             1.0 - len(list_distinct(sh)) * 1.0 / len(sh) END, 6) AS repetition
    FROM s
    """,
)
def txt_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tx.tokens(F.col("text")).alias("__toks"))
    return toked.select(
        "doc_id",
        F.round(tx.repetition_ratio_tokens(F.col("__toks")), 6).alias("repetition"),
    )


@register(
    "txt_model_score",
    """
    SELECT doc_id,
           round(list_sum(list_transform(string_split(text, ''), c -> ord(c)))
                 / greatest(length(text), 1) / 255.0, 6) AS score
    FROM documents
    """,
)
def txt_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based scoring plumbing (operators/text.py:model_score): Arrow
    record batches to an executor-side scorer, scores back column-aligned
    — the run shape of perplexity/classifier curation gates. The model is
    the documented stub (deterministic byte statistic, ASCII fixtures make
    char ords equal bytes), so the plumbing is exactly SQL-checkable."""
    return tx.model_score(_t(spark, sf_dir, "documents"))


def _sql_model_score_real() -> str:
    """Oracle for the REAL trained quality model: the identical feature
    arithmetic (integer counts, count-ratio divisions — IEEE-exact, no
    libm) and the identical fixed-order dot product, with every weight
    literal cast ::DOUBLE (DuckDB parses bare decimal literals as
    DECIMAL — the f7 lesson). Tokenization and the punctuation class
    use the model's EXPLICIT whitespace set (quality_model.WS_CLASS)
    rather than ``\\s`` — RE2, Java and Python disagree on VT/NBSP, so
    the shared explicit class is what keeps the logit bit-exact on
    non-ASCII-whitespace text.

    CASE-FOLDING ASSUMPTION (the whitespace class's sibling): both
    engines lowercase with their native ``lower()``, which agree on
    ASCII and the common 1:1 Unicode mappings but can diverge on
    full-Unicode special cases (U+0130 İ expands to two codepoints in
    Python, Final Sigma is context-sensitive) — any divergence shifts
    token boundaries/lengths and breaks the bit-exact gate. The fixture
    corpus is ASCII so the gate is safe here; running this oracle on an
    arbitrary corpus requires either verifying it is free of
    special-case codepoints or folding only ``[A-Z]`` explicitly in
    BOTH engines."""
    from solarboat_data_pipeline_spark.operators import quality_model as qm

    ws = "\\t\\n\\x0b\\f\\r "  # RE2 escapes for quality_model.WS_CLASS
    toks = rf"list_filter(string_split_regex(lower(text), '[{ws}]+'), x -> x != '')"
    stops = sorted({w for ws_ in tx.LANG_STOPWORDS.values() for w in ws_})
    feats = [
        "(n_chars / 1000.0::DOUBLE)",
        "(n_words / 100.0::DOUBLE)",
        "(CASE WHEN n_words > 0 THEN (sum_len / n_words) / 10.0::DOUBLE ELSE 0.0::DOUBLE END)",
        "(CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0::DOUBLE END)",
        "(CASE WHEN n_chars > 0 THEN n_digit / n_chars ELSE 0.0::DOUBLE END)",
        "(CASE WHEN n_words > 0 THEN n_stop / n_words ELSE 0.0::DOUBLE END)",
        "(CASE WHEN n_words > 0 THEN 1.0::DOUBLE - n_distinct / n_words ELSE 0.0::DOUBLE END)",
    ]
    z = f"{qm.BIAS!r}::DOUBLE"
    for w, f in zip(qm.WEIGHTS, feats):
        z = f"({z} + {w!r}::DOUBLE * {f})"
    return f"""
    WITH t AS (SELECT doc_id, text, {toks} AS toks FROM documents),
         c AS (SELECT doc_id,
                 length(text) AS n_chars,
                 len(toks) AS n_words,
                 list_sum(list_transform(toks, t -> length(t))) AS sum_len,
                 len(regexp_extract_all(text, '[^A-Za-z0-9{ws}]')) AS n_punct,
                 len(regexp_extract_all(text, '[0-9]')) AS n_digit,
                 len(list_filter(toks, t -> list_contains({stops!r}, t))) AS n_stop,
                 len(list_distinct(toks)) AS n_distinct
               FROM t)
    SELECT doc_id, {z} AS logit, {z} > 0 AS keep FROM c
    """


@register("txt_model_score_real", _sql_model_score_real())
def txt_model_score_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL model inference (operators/quality_model.py via
    text.model_score(fake=False)): the in-repo TRAINED logistic quality
    model (gradient descent on a deterministic synthetic corpus, frozen
    weights, heldout acc 0.9825) scoring documents through the Arrow
    mapInPandas contract. The oracle recomputes the identical
    feature-and-dot-product arithmetic in SQL — the logit is bit-exact
    cross-engine (counts, count ratios, fixed-order multiply-add; the
    sigmoid stays out of the gate because exp() is libm). ``keep`` is
    the sign of the logit — the actual curation decision."""
    scored = tx.model_score(_t(spark, sf_dir, "documents"), fake=False)
    return scored.select("doc_id", "logit", "keep")


@register(
    "txt_decontaminate",
    f"""
    WITH t AS (SELECT doc_id, {{toks}} AS toks FROM documents),
         s AS (SELECT doc_id, list_distinct({{sh}}) AS sh FROM t),
         h AS (SELECT doc_id, {{h32}} AS hh FROM (SELECT doc_id, unnest(sh) AS g FROM s)),
         bench AS (SELECT DISTINCT hh FROM h WHERE doc_id % 29 = 0),
         train AS (SELECT doc_id, hh FROM h WHERE doc_id % 29 != 0)
    SELECT train.doc_id AS id, count(*)::BIGINT AS n_contaminated
    FROM train JOIN bench USING (hh)
    GROUP BY train.doc_id
    """.format(toks=SQL_TOKENS.format(t="text"), sh=sql_shingles("toks"), h32=sql_h32("g")),
)
def txt_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: distinct word-3-gram overlap of each
    training doc against a (broadcast) eval corpus — docs with
    n_contaminated > 0 would be quarantined before pretraining. Eval set =
    every 29th doc, deterministically."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 29 == 0)
    train = docs.filter(F.col("doc_id") % 29 != 0)
    out = dd.decontaminate(train, bench)
    return out.select("id", F.col("n_contaminated").cast("long").alias("n_contaminated"))


@register(
    "txt_decontaminate_scaled",
    f"""
    WITH t AS (SELECT doc_id, {{toks}} AS toks FROM documents),
         s AS (SELECT doc_id, list_distinct({{sh}}) AS sh FROM t),
         h AS (SELECT doc_id, {{h32}} AS hh FROM (SELECT doc_id, unnest(sh) AS g FROM s)),
         bench AS (SELECT DISTINCT hh FROM h WHERE doc_id % 17 = 0),
         train AS (SELECT doc_id, hh FROM h WHERE doc_id % 17 != 0)
    SELECT train.doc_id AS id, count(*)::BIGINT AS n_contaminated
    FROM train JOIN bench USING (hh)
    GROUP BY train.doc_id
    """.format(toks=SQL_TOKENS.format(t="text"), sh=sql_shingles("toks"), h32=sql_h32("g")),
)
def txt_decontaminate_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination in its broadcast-infeasible 100 TB shape
    (operators/dedup.py:decontaminate(strategy="bloom") — round 7): when
    the eval corpus's distinct-shingle hash set exceeds the broadcast
    threshold, a Bloom filter of the set (built distributed via a bit_or
    hash aggregate, ~10 bits/item, broadcast as one blob) prunes the
    train side MAP-SIDE before its exchange, so the exact verify join
    shuffles only bloom survivors instead of every shingle of the
    corpus; false positives are re-verified by the equi-join, so the
    result is exact for any fpp. Same SQL oracle as txt_decontaminate —
    the strategies differ only in physical plan."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    out = dd.decontaminate(train, bench, strategy="bloom")
    return out.select("id", F.col("n_contaminated").cast("long").alias("n_contaminated"))


@register(
    "txt_decontaminate_fuzzy",
    f"""
    WITH {_sql_lsh_pairs()},
         m_bench AS (SELECT doc_id, mins FROM m WHERE doc_id % 29 = 0),
         m_train AS (SELECT doc_id, mins FROM m WHERE doc_id % 29 != 0),
         b_bench AS (SELECT doc_id, band, band_hash FROM b WHERE doc_id % 29 = 0),
         b_train AS (SELECT doc_id, band, band_hash FROM b WHERE doc_id % 29 != 0),
         cand AS (SELECT DISTINCT tr.doc_id AS t_id, be.doc_id AS b_id
                  FROM b_train tr JOIN b_bench be USING (band, band_hash)),
         dropped AS (
           SELECT DISTINCT c.t_id FROM cand c
           JOIN m_train mt ON mt.doc_id = c.t_id
           JOIN m_bench mb ON mb.doc_id = c.b_id
           WHERE list_sum(list_transform(generate_series(1, {dd.NUM_HASHES}),
                   k -> CASE WHEN mt.mins[k] = mb.mins[k] THEN 1 ELSE 0 END))
                 / {dd.NUM_HASHES}.0 >= 0.5)
    SELECT doc_id FROM documents
    WHERE doc_id % 29 != 0 AND doc_id NOT IN (SELECT t_id FROM dropped)
    """,
)
def txt_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY benchmark decontamination — the hygiene pass exact n-gram
    overlap (txt_decontaminate) cannot do: training docs that NEAR-match
    an eval doc (paraphrased or lightly-edited benchmark leakage) are
    dropped via the same banded-MinHash machinery as incremental
    near-dup dedup (operators/dedup.py:near_dup_against with the eval
    corpus as the index side), candidates verified by the signature
    Jaccard estimate ≥ 0.5. Returns the surviving training docs. At
    100 TB the eval side is tiny: its band/signature tables broadcast,
    and the train side is touched once."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 29 == 0)
    train = docs.filter(F.col("doc_id") % 29 != 0)
    out = dd.near_dup_against(
        train,
        dd.band_index(bench),
        seen_signatures=dd.signature_index(bench),
        threshold=0.5,
    )
    return out.select("doc_id")


@register(
    "txt_redact",
    r"""
    WITH p AS (SELECT doc_id,
        'email u' || doc_id::VARCHAR || '@ex-corp.io tel 555 123 4567 acct 1234567 | '
          || text AS raw
      FROM documents)
    SELECT doc_id,
      regexp_replace(
        regexp_replace(
          regexp_replace(raw,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '[0-9][0-9 .-]{7,}[0-9]', '<PHONE>', 'g'),
        '[0-9]{6,}', '<NUM>', 'g') AS redacted
    FROM p
    """,
)
def txt_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (emails, phone-shaped digit runs, long numbers) over a
    synthetic PII prefix + the document text; chained replace-all regexes,
    identical RE2-compatible patterns on both sides."""
    docs = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("email u"),
        F.col("doc_id").cast("string"),
        F.lit("@ex-corp.io tel 555 123 4567 acct 1234567 | "),
        F.col("text"),
    )
    return docs.select("doc_id", tx.redact_pii(raw).alias("redacted"))
