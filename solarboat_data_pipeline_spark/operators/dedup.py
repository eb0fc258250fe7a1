"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the 100 TB story):

* **exact** — one hash aggregate on a digest; map-side partial agg makes
  the shuffle tiny (one row per distinct digest).
* **MinHash signatures** — per-row array expressions only, no shuffle; the
  LSH candidate join shuffles on (band, band_hash) — the classic
  sub-quadratic near-dup plan (shingle→minhash→band→bucket join).
* **SimHash** — per-row expressions; near-dup candidates join on the
  16-bit bucket (or rotate buckets for Hamming distance > 0).
* **n-gram Jaccard** — exact pairwise similarity via a shingle-posting
  join; quadratic in bucket size, so at scale it runs AFTER LSH pruning
  (``jaccard_verify`` takes candidate pairs). The standalone all-pairs form
  is for oracle-checkable correctness at test scale.

All hashing is the md5-based ``h32`` so every operator has an exact DuckDB
oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators.text import h32, tokens, word_shingles

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
SIMHASH_BITS = 16

# MinHash permutations: ONE md5 per shingle, then multiply-shift mixing
# h_j = (A[j]*h + B[j]) mod 2^32 with A odd — 16× fewer digest
# computations than hashing per permutation, and still exactly
# reproducible in SQL. A ~ 2^30 wraps the modulus ~A/2 times per unit of
# h, so the 16 maps order shingles near-independently. (The previous
# (A*h + B) mod (2^61-1) form with A < 2^30 wrapped AT MOST ONCE — every
# map stayed piecewise-monotone in h, the 16 per-doc minima were highly
# correlated, and 1 M-doc LSH recall measured ~8 points under the
# banding expectation; this form closes the gap — see SCALE.md.)
# A < 2^31 and h < 2^32 keep A*h + B < 2^63: BIGINT-exact in Spark AND
# DuckDB, no unsigned wrap anywhere.
MINHASH_MOD = 1 << 32


def _perm_constants(num_hashes: int = NUM_HASHES) -> list[tuple[int, int]]:
    import hashlib as _hl

    out = []
    for j in range(num_hashes):
        a = (int(_hl.md5(f"a{j}".encode()).hexdigest()[:8], 16) % (1 << 31)) | 1
        b = int(_hl.md5(f"b{j}".encode()).hexdigest()[:8], 16)
        out.append((a, b))
    return out


PERM_CONSTANTS = _perm_constants()


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on content digest: keep the lowest id per md5(text).
    Returns (digest, keep_id, n_dups)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("digest"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def _shingle_hashes(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per (doc, distinct shingle) with its 32-bit hash — ONE md5
    per shingle total. Array-expression formulations instead inline the
    whole tokenize→shingle→md5 subtree into every consumer (higher-order
    functions are interpreted, not codegen'd, and Catalyst re-inlines
    collapsed projections), which measured ~100× slower per row."""
    # tokens materialize in their own projection: the shingle builder
    # references the token array O(tokens) times, and CollapseProject would
    # otherwise re-inline (and re-evaluate) the regex split per reference
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    sh = F.array_distinct(word_shingles(F.col("__toks")))
    return toked.select(F.col(id_col), F.explode(sh).alias("__sh")).select(
        id_col, h32(F.col("__sh")).alias("__h")
    )


def minhash_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """MinHash signatures as one row per document with ≥1 shingle, columns
    ``mh0..mh{n-1}``.

    Plan shape: explode distinct shingles → one md5 per shingle row → hash
    aggregate of the 16 affine-permutation minima. All integer mixing stays
    in whole-stage codegen; a document's shingles never leave its input
    partition (explode preserves locality), so map-side partial aggregation
    reduces to one row per doc before the single shuffle."""
    h = _shingle_hashes(df, text_col, id_col)
    aggs = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(MINHASH_MOD)).alias(
            f"mh{j}"
        )
        for j, (a, b) in enumerate(PERM_CONSTANTS[:num_hashes])
    ]
    return h.groupBy(id_col).agg(*aggs)


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "minhash",
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """Attach the signature as ``array<long>`` (null for shingle-less docs)."""
    m = minhash_table(df, text_col, id_col, num_hashes)
    sig = F.when(
        F.col("mh0").isNotNull(),
        F.array(*[F.col(f"mh{j}") for j in range(num_hashes)]),
    ).alias(out_col)
    return df.join(m, id_col, "left").select(*df.columns, sig)


def dedup_against(
    incoming: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    digest_col: str | None = None,
) -> DataFrame:
    """Incremental-ingest exact dedup: keep only ``incoming`` rows whose
    content digest does not appear in ``seen`` — a LEFT ANTI join on the
    digest. At corpus scale pass ``seen`` as the (small) digest-only index
    of the existing corpus via ``digest_col`` (a column of precomputed
    md5(text) hex digests) instead of the corpus text: the anti join then
    shuffles digests only, and the incoming side streams through
    unchanged. With ``digest_col=None`` the digests are derived from
    ``seen[text_col]``."""
    if digest_col is not None:
        seen_digests = seen.select(F.col(digest_col).alias("__digest")).distinct()
    else:
        seen_digests = seen.select(
            F.md5(F.col(text_col)).alias("__digest")
        ).distinct()
    return incoming.withColumn(
        "__digest", F.md5(F.col(text_col))
    ).join(seen_digests, "__digest", "anti").drop("__digest")


def minhash_jaccard_estimate(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """Signature-only Jaccard ESTIMATE for candidate pairs — the cheap
    middle rung between LSH candidates and the exact postings-join verify:
    the fraction of agreeing signature components is an unbiased estimator
    of the true Jaccard (stderr ≈ √(J(1−J)/num_hashes)), computed from
    the already-aggregated signatures with two id-equi-joins and no
    re-tokenization of document text. ``pairs=None`` scores the LSH
    candidates; note that with ``pairs=None`` and a reduced
    ``num_hashes`` the candidate pairs still come from the FULL-width
    banded LSH (the banding constants assume ``NUM_HASHES`` components),
    while the estimate itself uses only ``num_hashes`` components.
    Returns ``(id_a, id_b, jaccard_est)``."""
    if pairs is None and num_hashes != NUM_HASHES:
        # banding constants assume the full signature width; resolve the
        # candidates first so the reduced-width signature table below is
        # built exactly once (no dead full-plan behind a recursion)
        pairs = lsh_candidate_pairs(df, text_col, id_col)
    # materialize signatures ONCE (lazy local checkpoint): the band join
    # and both estimate sides consume them, and each branch would
    # otherwise re-run the tokenize→shingle→md5→min aggregation over the
    # whole corpus — the dominant cost at scale
    sig = minhash_table(df, text_col, id_col, num_hashes).localCheckpoint(
        eager=False
    )
    if pairs is None:
        exploded = sig.select(
            id_col, F.posexplode(_band_hash_array()).alias("band", "band_hash")
        )
        a_, b_ = exploded.alias("a"), exploded.alias("b")
        pairs = (
            a_.join(
                b_,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .distinct()
        )
    a = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh{j}").alias(f"__a{j}") for j in range(num_hashes)],
    )
    b = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh{j}").alias(f"__b{j}") for j in range(num_hashes)],
    )
    agree = None
    for j in range(num_hashes):
        term = F.when(F.col(f"__a{j}") == F.col(f"__b{j}"), 1).otherwise(0)
        agree = term if agree is None else agree + term
    est = F.round(agree.cast("double") / num_hashes, 6)
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", est.alias("jaccard_est"))
    )


def _band_hash_array(
    bands: int = BANDS, rows: int = ROWS_PER_BAND
) -> Column:
    """LSH band digests over materialized ``mh*`` columns: md5 per band."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh{b * rows + r}").cast("string")
                        for r in range(rows)
                    ],
                )
            )
            for b in range(bands)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """MinHash-LSH near-duplicate candidate pairs (id_a < id_b): documents
    sharing at least one band bucket. The self-join shuffles on
    (band, band_hash) — sub-quadratic: only same-bucket docs ever meet."""
    sig = minhash_table(df, text_col, id_col)
    # both sides of the self-join read this subtree; without a cut the
    # tokenize→shingle→minhash aggregation runs twice (probe + build
    # sides of a join never share an Exchange). The exploded band table
    # is 24 bytes × BANDS per doc — far narrower than the signature
    # array it derives from, let alone the text.
    exploded = sig.select(
        id_col, F.posexplode(_band_hash_array()).alias("band", "band_hash")
    ).localCheckpoint(eager=False)
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    signatures: DataFrame | None = None,
) -> DataFrame:
    """The persistable LSH index of a corpus: one ``(id, band,
    band_hash)`` row per document band — digests only, no text. An
    ingest pipeline writes this once per corpus state and appends each
    accepted increment's rows; :func:`near_dup_against` probes it. At
    100 TB the index is a small fraction of the corpus (BANDS rows ×
    one md5 per doc) and the corpus text is never re-read.

    ``signatures`` (a precomputed :func:`minhash_table` frame, ideally
    localCheckpointed) lets a caller writing BOTH indexes of one corpus
    pay the tokenize→shingle→md5→min aggregation once instead of once
    per index (guide §1.2: don't compute things twice)."""
    sig = (
        signatures
        if signatures is not None
        else minhash_table(df, text_col, id_col)
    )
    return sig.where(F.col("mh0").isNotNull()).select(
        id_col, F.posexplode(_band_hash_array()).alias("band", "band_hash")
    )


def signature_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    signatures: DataFrame | None = None,
) -> DataFrame:
    """The verification companion to :func:`band_index`: one
    ``(id, minhash array<long>)`` row per document with ≥ 1 shingle —
    what :func:`near_dup_against` needs to turn band-bucket candidates
    into estimated-Jaccard verdicts without touching text.
    ``signatures`` shares one minhash pass with :func:`band_index`."""
    sig = (
        signatures
        if signatures is not None
        else minhash_table(df, text_col, id_col)
    )
    return sig.where(F.col("mh0").isNotNull()).select(
        id_col,
        F.array(*[F.col(f"mh{j}") for j in range(NUM_HASHES)]).alias("minhash"),
    )


def lsh_hot_buckets(
    seen_bands: DataFrame, bucket_cap: int
) -> DataFrame:
    """The (band, band_hash) buckets of a persisted :func:`band_index`
    holding MORE than ``bucket_cap`` documents — boilerplate band
    digests shared corpus-wide. The accounting side of
    :func:`near_dup_against`'s ``bucket_cap`` guard: persist or count
    this table whenever the cap is in force, so what the guard skipped
    is never silent. ≤ N·BANDS/bucket_cap rows by construction."""
    return _hot_buckets_over(seen_bands, bucket_cap, ("band", "band_hash"))


def near_dup_against(
    incoming: DataFrame,
    seen_bands: DataFrame,
    seen_signatures: DataFrame | None = None,
    threshold: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cap: int | None = None,
) -> DataFrame:
    """Incremental-ingest NEAR-duplicate dedup — the fuzzy sibling of
    :func:`dedup_against`, the shape a daily crawl increment actually
    needs (new pages that near-duplicate pages ALREADY IN the corpus
    must be dropped, not just byte-exact copies).

    ``seen_bands`` is the existing corpus's :func:`band_index` (read
    back from its persisted parquet between increments). Candidates are
    incoming docs sharing ≥ 1 LSH band bucket with any indexed doc —
    the same sub-quadratic banded join as :func:`lsh_candidate_pairs`,
    but incoming×index instead of a self-join. With ``threshold`` (and
    ``seen_signatures``, the :func:`signature_index`), each candidate
    pair is VERIFIED by the MinHash Jaccard estimate (fraction of equal
    signature components) and only incoming docs with a verified match
    ≥ ``threshold`` are dropped — band collisions alone over-drop at
    the ~r^(rows-per-band) false-positive rate of the banding.

    Returns the surviving ``incoming`` rows (original columns).

    100 TB shape: the corpus is represented ONLY by its band + signature
    indexes (digests and 16 longs per doc); the increment is hashed
    once; the candidate join shuffles band digests; verification is
    candidate-restricted; corpus text is never re-read or re-shuffled.

    ``bucket_cap`` is the hot-bucket guard for this incremental join: a
    boilerplate band digest shared by millions of indexed docs makes the
    candidate join emit |incoming_bucket|·|seen_bucket| rows for that
    key in ONE task. Index buckets above the cap are anti-joined away
    (bounded broadcast), capping per-bucket candidates at
    |incoming_bucket|·cap. Semantics: an incoming doc whose ONLY shared
    buckets are hot is NOT dropped — at that copy count the hash-exact
    :func:`dedup_against` or :func:`paragraph_dedup` is the right tool,
    and :func:`lsh_hot_buckets` enumerates exactly which buckets the
    guard skipped (no silent truncation).
    """
    if (threshold is None) != (seen_signatures is None):
        raise ValueError(
            "threshold and seen_signatures must be passed together "
            "(band-only candidates over-drop; signatures without a "
            "threshold are unused)"
        )
    # materialize the increment's signatures once (lazy local
    # checkpoint): the band explode AND the verification array both
    # consume them, and each branch of the single output plan would
    # otherwise re-run the tokenize→shingle→md5→min aggregation over
    # the whole increment (the dominant per-ingest cost)
    inc_sig = minhash_table(incoming, text_col, id_col).localCheckpoint(
        eager=False
    )
    inc_bands = inc_sig.where(F.col("mh0").isNotNull()).select(
        F.col(id_col).alias("__inc_id"),
        F.posexplode(_band_hash_array()).alias("band", "band_hash"),
    )
    seen_b = seen_bands.select(
        F.col(id_col).alias("__seen_id"), "band", "band_hash"
    )
    if bucket_cap is not None:
        hot = lsh_hot_buckets(seen_bands, bucket_cap).select(
            "band", "band_hash"
        )
        seen_b = seen_b.join(F.broadcast(hot), ["band", "band_hash"], "left_anti")
    cand = (
        inc_bands.join(seen_b, ["band", "band_hash"])
        .select("__inc_id", "__seen_id")
        .distinct()
    )
    if threshold is not None:
        inc_arr = inc_sig.where(F.col("mh0").isNotNull()).select(
            F.col(id_col).alias("__inc_id"),
            F.array(*[F.col(f"mh{j}") for j in range(NUM_HASHES)]).alias("__a"),
        )
        seen_arr = seen_signatures.select(
            F.col(id_col).alias("__seen_id"), F.col("minhash").alias("__b")
        )
        est = (
            F.aggregate(
                F.zip_with(
                    F.col("__a"), F.col("__b"),
                    lambda x, y: F.when(x == y, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / F.lit(NUM_HASHES)
        )
        drops = (
            cand.join(inc_arr, "__inc_id")
            .join(seen_arr, "__seen_id")
            .where(est >= F.lit(threshold))
            .select("__inc_id")
            .distinct()
        )
    else:
        drops = cand.select("__inc_id").distinct()
    return incoming.join(
        drops.withColumnRenamed("__inc_id", id_col), id_col, "anti"
    )


def simhash_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """SimHash per document with ≥1 token: bit b set when more (multiset)
    token hashes have bit b set than not. Same explode→hash-agg shape as
    :func:`minhash_table`: per-bit popcounts are conditional sums inside one
    codegen'd aggregate. ``bits`` ≤ 63 (one signed long; bit 63 would
    overflow the ``1 << b`` literal)."""
    if not 1 <= bits <= 63:
        raise ValueError(f"bits ({bits}) must be in [1, 63]")
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t")
    ).select(id_col, h32(F.col("__t")).alias("__h"))
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.shiftright("__h", b).bitwiseAND(1)).alias(f"__ones{b}")
        for b in range(bits)
    ]
    per_doc = toks.groupBy(id_col).agg(*aggs)
    acc = F.lit(0).cast("long")
    for b in range(bits):
        acc = acc + F.when(
            F.col(f"__ones{b}") * 2 > F.col("__n"), F.lit(1 << b)
        ).otherwise(F.lit(0)).cast("long")
    return per_doc.select(id_col, acc.alias("simhash"))


def _banded_base(
    sig: DataFrame, sig_col: str, id_col: str, bits: int, bands: int
) -> DataFrame:
    """One ``(id, sig, band, key)`` row per (signature, band): the
    signed-long signature split into ``bands`` contiguous bit-bands,
    each band's bits as an equi-joinable ``key``. Shared by the
    self-join pair finders and the hot-bucket accounting so both see
    the identical bucketing."""
    if bits % bands:
        raise ValueError(f"bands ({bands}) must evenly divide bits ({bits})")
    w = bits // bands
    keys = [
        F.shiftright(sig_col, t * w).bitwiseAND(F.lit((1 << w) - 1)).cast("long")
        for t in range(bands)
    ]
    return sig.select(
        F.col(id_col).alias("id"),
        F.col(sig_col).alias("sig"),
        F.posexplode(F.array(*keys)).alias("band", "key"),
    )


def _hot_buckets_over(
    rows: DataFrame, bucket_cap: int, key_cols: tuple[str, ...]
) -> DataFrame:
    """The one "count per bucket, keep strictly-greater-than cap"
    aggregate behind every hot-bucket guard and accounting surface
    (self-join, perceptual index, LSH band index) — a single definition
    so the accounting tables and the actual anti-join drops can never
    drift apart. Returns ``(*key_cols, n)``."""
    if bucket_cap < 1:
        raise ValueError(f"bucket_cap ({bucket_cap}) must be >= 1")
    return (
        rows.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > bucket_cap)
    )


def banded_hot_buckets(
    sig: DataFrame,
    bucket_cap: int,
    sig_col: str = "simhash",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
    bands: int = BANDS,
) -> DataFrame:
    """The (band, key) buckets holding MORE than ``bucket_cap``
    signatures — the accounting side of the hot-bucket guard. A bucket
    shared by b distinct-but-near signatures (near-black images, boiler-
    plate text) makes the banded self-join emit ~b²/2 candidates; at
    10⁸-row scale one such bucket dominates the stage. Callers that pass
    ``bucket_cap`` to a pair finder should persist or count THIS table —
    the dropped work is a first-class queryable artifact, never a silent
    truncation. Returns ``(band, key, n)``; at most N/bucket_cap rows by
    construction, so it always broadcasts."""
    return _hot_buckets_over(
        _banded_base(sig, sig_col, id_col, bits, bands),
        bucket_cap,
        ("band", "key"),
    )


def banded_signature_pairs(
    sig: DataFrame,
    max_hamming: int,
    sig_col: str,
    id_col: str,
    bits: int,
    bands: int,
    bucket_cap: int | None = None,
) -> DataFrame:
    """The banded-bucket self-join over ANY precomputed signed-long
    signature column — the single plan behind
    :func:`simhash_near_dup_pairs` and
    :func:`perceptual.banded_hamming_pairs` (text simhash, image dHash,
    audio energy hash, video fold all ride it).

    A pair is a candidate when ANY band's bits match exactly ((band,
    key) equi-join — the only shuffle, over 24-byte rows), then exact
    Hamming (``bit_count(xor)``) filters to ``max_hamming``. Pigeonhole:
    with ``max_hamming < bands`` a qualifying pair differs in at most
    ``max_hamming`` bands, so at least one matches — recall is EXACT.

    ``bucket_cap`` is the hot-bucket guard: buckets holding more than
    ``bucket_cap`` signatures are excluded from the join via a BROADCAST
    anti-join (the hot set is ≤ N/bucket_cap rows, so the broadcast is
    bounded by construction), keeping per-bucket work ≤ cap²/2 instead
    of quadratic in the hottest bucket. With the cap, recall is exact
    for every pair sharing at least one NON-HOT band; pairs confined to
    hot buckets are dropped — enumerate them with
    :func:`banded_hot_buckets` (same arguments) and persist that table
    alongside the pairs. On a corpus with no bucket above the cap the
    output is row-identical to the unguarded join.

    Returns ``(id_a, id_b, hamming)``, ``id_a < id_b``, band duplicates
    collapsed."""
    if not max_hamming < bands:
        raise ValueError(
            f"exact recall needs max_hamming ({max_hamming}) < bands ({bands})"
        )
    # the self-join references the signature subtree TWICE — probe and
    # build sides of a join can never share an Exchange (the build side
    # is a BroadcastExchange; with SMJ the sort differs) — and the
    # hot-bucket guard adds a third reference. Every caller computes
    # signatures inline from an expensive lineage (media decode, text
    # shingling, simhash), so materialize the narrow (id, sig)
    # projection once; it is ~16 bytes/row at any corpus scale, far
    # smaller than the lineage it replaces. Lazy: the first action pays
    # it, plan-only uses (explain, tests on the lazy frame) stay free.
    sig = sig.select(id_col, sig_col).localCheckpoint(eager=False)
    base = _banded_base(sig, sig_col, id_col, bits, bands)
    if bucket_cap is not None:
        # aggregate over the SAME base subtree the join reads (not a
        # fresh _banded_base over sig): the broadcast branch then shares
        # the exploded plan — and its (band, key) exchange is reusable —
        # instead of re-running the signature lineage a third time.
        # Callers whose signature lineage is expensive (media decode)
        # should additionally persist the signature table or use the
        # persisted index forms.
        hot = _hot_buckets_over(base, bucket_cap, ("band", "key")).select(
            "band", "key"
        )
        base = base.join(F.broadcast(hot), ["band", "key"], "left_anti")
    a, b = base.alias("a"), base.alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
    bands: int = BANDS,
    bucket_cap: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs via the banded-bucket join: the signature is
    split into ``bands`` contiguous bit-bands; a pair is a candidate when
    ANY band matches exactly, then the exact Hamming distance
    (``bit_count(xor)``) filters to ``max_hamming``.

    Pigeonhole guarantee: with ``max_hamming < bands``, a qualifying pair
    differs in at most ``max_hamming`` bands, so at least one band matches
    — recall is exact, unlike hyperplane LSH. The trade is candidate
    volume: expected N²/2^(bits/bands) per band. At corpus scale use wider
    signatures (``bits=48`` or ``60``, i.e. 12/15-bit band keys) so each
    band still has enough entropy; everything here is parameterized on
    ``bits``/``bands``. ``bits`` is capped at 63 — the signature lives in
    one signed long. ``bucket_cap`` bounds per-bucket join work (see
    :func:`banded_signature_pairs`; account for drops with
    :func:`banded_hot_buckets` over :func:`simhash_table`'s output).
    Round-13 contract change (intentional): ``max_hamming >= bands``
    now raises instead of silently returning reduced-recall pairs —
    the uniform exactness contract of the shared banded core; widen
    ``bands`` (or lower ``max_hamming``) to stay in the exact regime.

    Returns ``(id_a, id_b, hamming)``, ``id_a < id_b``, duplicates across
    bands collapsed."""
    sh = simhash_table(df, text_col, id_col, bits).where(
        F.col("simhash").isNotNull()
    )
    return banded_signature_pairs(
        sh, max_hamming, "simhash", id_col, bits, bands, bucket_cap
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard computed ONLY for candidate pairs — the verify
    stage after LSH pruning. Shingle postings are semi-join-restricted to
    ids appearing in ``pairs`` first, so the posting join never touches
    documents without candidates. Returns (id_a, id_b, jaccard ≥ threshold)."""
    ids = (
        pairs.select(F.col("id_a").alias("id"))
        .union(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    toked = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks")
    ).join(ids, "id", "semi")
    # the postings feed THREE consumers (sizes, a-side, b-side); without a
    # cut Spark recomputes the tokenize→shingle→explode subtree per branch.
    # They are candidate-restricted (only docs appearing in ``pairs``), so
    # materializing is small regardless of corpus size.
    sh = toked.select(
        "id",
        F.explode(F.array_distinct(word_shingles(F.col("__toks")))).alias("sh"),
    ).localCheckpoint()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("id").alias("id_a"), "sh")
    b = sh.select(F.col("id").alias("id_b"), "sh")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def near_dup_dedup(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The complete near-duplicate REMOVAL pipeline:
    shingle→MinHash→LSH candidates → exact-Jaccard verify → connected
    components → keep the minimum id per cluster. Returns
    (drop_id, keep_id): one row per document to remove, pointing at its
    kept representative. Documents with no verified near-dup never appear.
    Every stage is sub-quadratic: candidates come only from shared LSH
    bands, verification touches only candidates, clustering iterates
    join+aggregate rounds over the verified edge set."""
    # materialize the candidate pairs once (lazy local checkpoint): the
    # verify stage references them THREE times (candidate-id semi-join,
    # postings join, output), and each branch would otherwise re-run the
    # full tokenize→shingle→minhash→band self-join subtree
    cands = lsh_candidate_pairs(df, text_col, id_col).localCheckpoint(
        eager=False
    )
    verified = jaccard_verify(df, cands, threshold, text_col, id_col)
    comp = connected_components(verified.select("id_a", "id_b"))
    return comp.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("drop_id"), F.col("cluster_id").alias("keep_id")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Near-duplicate CLUSTERS from candidate pairs: connected components
    by iterative min-label propagation. Returns (doc_id, cluster_id) for
    every vertex in ``pairs``; cluster_id = the component's minimum id.

    Each iteration is one join + one aggregate (label ← min over self and
    neighbors); converges in O(diameter) rounds — near-dup components are
    shallow (dup groups, not long chains), so a handful. ``localCheckpoint``
    cuts the growing lineage so iteration N doesn't replan N-deep. The
    classic alternative for adversarial graphs is large/small-star; for
    dedup workloads min-propagation is the simpler, equally scalable loop.

    Size-adaptive finish (the AQE philosophy applied to iteration): every
    Spark round costs a fixed scheduling latency no matter how small the
    graph, and the verified near-dup EDGE set is orders of magnitude
    smaller than the corpus — even a 100 TB corpus with 0.1% near-dup rate
    yields edges that fit in driver memory. When the deduped edge count is
    under ``driver_threshold``, finish with union-find on the driver (one
    collect + one createDataFrame) instead of O(diameter) cluster rounds;
    above it, run the distributed loop. Results are identical."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    if edges.count() <= driver_threshold:
        parent: dict = {}
        vertices: set = set()

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        # one collect, not toLocalIterator: the iterator form runs one
        # sequential mini-job PER PARTITION (32 jobs of fixed scheduling
        # latency for a few thousand edges); the row count is already
        # bounded by driver_threshold, so a single collect is safe
        for row in edges.collect():
            a, b = row["src"], row["dst"]
            vertices.add(a)
            vertices.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:  # union by min so the root IS the cluster id
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        out = sorted((v, find(v)) for v in vertices)
        schema = edges.select(
            F.col("src").alias("doc_id"), F.col("dst").alias("cluster_id")
        ).schema
        from solarboat_data_pipeline_spark.operators.similarity import (
            _local_frame,
        )

        # single-slice local frame: the plain createDataFrame would
        # parallelize to defaultParallelism slices and every downstream
        # action would pay one Python-runner evaluation per slice
        return _local_frame(pairs.sparkSession, out, schema)
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        # the convergence flag rides along in the same projection, so each
        # iteration is ONE join+agg job (the checkpoint materialization);
        # a separate old-vs-new self-join would double the per-round work
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nmin"), F.col("label")) < F.col("label")).alias(
                    "__changed"
                ),
            )
            .localCheckpoint()
        )
        changed = new_labels.where(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def embedding_cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold). Brute-force baseline: norms materialize once per row, the
    self-join compares all pairs. The scale path for 100 TB is the same
    comparison restricted to LSH buckets (see
    :func:`..similarity.lsh_ann_topk`'s bucketing) — this exact form is the
    verification kernel run on candidate pairs."""
    from solarboat_data_pipeline_spark.operators.similarity import dot, norm

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("n"),
    )
    a, b = base.alias("a"), base.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cos, 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )


def lsh_table_salt(t: int) -> str:
    """Deterministic per-table hyperplane salt; table 0 matches the
    single-table planes (shared verbatim with the SQL oracles)."""
    return "" if t == 0 else f"t{t}:"


def embedding_lsh_dedup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int | None = None,
    tables: int = 1,
) -> DataFrame:
    """Embedding near-dup pairs, LSH-bucketed — the 100 TB form of
    :func:`embedding_cosine_pairs`. Rows are bucketed by deterministic
    random-hyperplane signs (one narrow projection, no shuffle), candidate
    pairs come from a bucket-equality self-join (expected N²/2^planes
    comparisons instead of N²), and the exact-cosine verification kernel
    runs only on those candidates.

    Recall < 1 by design: a pair whose signs differ in any plane of every
    table is never compared — that is the trade that makes embedding dedup
    feasible at corpus scale. ``tables`` > 1 is the standard
    OR-amplification: each row gets one bucket per independent plane set,
    a pair is a candidate if ANY table buckets it together
    (recall 1-(1-p^planes)^tables), and duplicate hits are collapsed with
    a distinct. Each extra table multiplies candidate volume, not corpus
    scans — the explode happens after the narrow projection."""
    from solarboat_data_pipeline_spark.operators.similarity import (
        dot,
        hyperplanes,
        norm,
        with_lsh_buckets_arrow,
    )

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    # bucket bits come from ONE vectorized Arrow pass instead of
    # tables × planes interpreted higher-order-function dot folds per
    # row (bit-identical — see with_lsh_buckets_arrow)
    plane_sets = [
        hyperplanes(dim, planes, lsh_table_salt(t)) for t in range(tables)
    ]
    bcols = [f"__b{t}" for t in range(tables)]
    # the self-join reads wb twice (probe + build — no Exchange reuse
    # across a broadcast), which would run the Arrow bucketing pass and
    # the upstream vector scan twice; materialize it once (lazy). The
    # stored bytes are the same id+vector+bucket rows one pass emits.
    wb = with_lsh_buckets_arrow(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        plane_sets,
        "v",
        bcols,
    ).localCheckpoint(eager=False)
    base = wb.select(
        "id",
        "v",
        norm(F.col("v")).alias("n"),
        F.posexplode(F.array(*[F.col(c) for c in bcols])).alias("t", "b"),
    )
    a, b = base.alias("a"), base.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n"))
    pairs = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.b") == F.col("b.b"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cos, 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
    # a pair found by several tables is one near-dup edge
    return pairs.distinct() if tables > 1 else pairs


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "simhash",
) -> DataFrame:
    """Attach the simhash (null for token-less docs)."""
    s = simhash_table(df, text_col, id_col).withColumnRenamed("simhash", out_col)
    return df.join(s, id_col, "left")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs ≥ threshold, via a
    shingle-posting self-join: |A∩B| from shared shingles, |A∪B| from set
    sizes. Returns (id_a, id_b, jaccard)."""
    toked = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks")
    )
    # four consumers reference the tokenize→shingle→explode subtree
    # (both posting sides of the intersection join, and the sizes
    # aggregate feeding na AND nb) — without a cut Spark re-tokenizes
    # the corpus four times. Materialize once (lazy); the stored rows
    # are the same postings one pass emits (same trade jaccard_verify
    # already makes).
    sh = toked.select(
        "id",
        F.explode(F.array_distinct(word_shingles(F.col("__toks")))).alias("sh"),
    ).localCheckpoint(eager=False)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n·ln p / ln²2 bits, k = (m/n)·ln 2
    probes; m rounded up to a whole number of 64-bit words, k clamped to
    [1, 8] (beyond 8 probes the per-row cost outweighs the fpp gain)."""
    import math

    m = max(64, math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = min(8, max(1, round(m / n_items * math.log(2))))
    return m, k


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    strategy: str = "broadcast",
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: per training document, the number of
    distinct word n-grams it shares with a benchmark/eval corpus (the
    standard pretraining hygiene check — docs with overlap > 0 get dropped
    or quarantined). Returns (id, n_contaminated) for overlap > 0 only.
    The result is EXACT under every strategy; ``strategy`` picks the
    physical plan for the regime the benchmark side is in:

    * ``"broadcast"`` (default) — the eval corpus's distinct shingle-hash
      set fits the broadcast threshold: the 100 TB train side streams
      through a broadcast hash join inside its scan stage with no shuffle
      of train data; the only exchange is the per-doc count aggregate
      (map-side combined).
    * ``"bloom"`` — the hash set is too large to broadcast-join but its
      Bloom filter (~10 bits/item at the default ``fpp=0.01`` — 20–50×
      smaller than the hashed-relation build of the set itself) still
      fits executor memory. The filter is built DISTRIBUTED (k probe
      positions per hash via seeded ``xxhash64``, OR-folded into 64-bit
      words by a ``bit_or`` hash aggregate — map-side combined, so the
      collect moves ≈ m/64 longs once), broadcast as one binary blob, and
      applied map-side by an Arrow-batched vectorized probe BEFORE the
      train side's exchange: the verify join's shuffle then carries only
      bloom survivors (true matches + ~fpp of the corpus) instead of
      every shingle of the 100 TB corpus. Exactness does not depend on
      ``fpp`` — a Bloom filter has no false negatives and the survivors
      are re-verified by the equi-join; ``fpp`` only sizes the verify
      shuffle. ``expected_items`` skips the sizing ``count()`` pass when
      the caller already knows the benchmark's distinct-shingle count.
    * ``"shuffle"`` — both sides genuinely large: co-partitioned shuffled
      hash join on the shingle hash (the bench ``distinct`` already
      hash-partitions on the join key, so the bench side reuses that
      exchange; the hint builds the per-partition map from the bench side
      and STREAMS the train side, avoiding sort-merge's full sort of the
      larger relation).
    """
    bench_sh = _shingle_hashes(benchmark, text_col, id_col).select("__h").distinct()
    train_sh = _shingle_hashes(train, text_col, id_col)
    if strategy == "broadcast":
        joined = train_sh.join(F.broadcast(bench_sh), "__h")
    elif strategy == "shuffle":
        joined = train_sh.join(bench_sh.hint("shuffle_hash"), "__h")
    elif strategy == "bloom":
        joined = _bloom_prefiltered_join(train_sh, bench_sh, fpp, expected_items)
    else:
        raise ValueError(
            f"unknown decontaminate strategy {strategy!r}: "
            "expected 'broadcast', 'bloom' or 'shuffle'"
        )
    return joined.groupBy(F.col(id_col).alias("id")).agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )


def _bloom_prefiltered_join(
    train_sh: DataFrame,
    bench_sh: DataFrame,
    fpp: float,
    expected_items: int | None,
) -> DataFrame:
    """Inner-join ``train_sh`` to ``bench_sh`` on ``__h`` with a
    broadcast-Bloom map-side prefilter on the train side (see
    ``decontaminate(strategy="bloom")``). PySpark exposes no public Bloom
    API (``DataFrameStatFunctions.bloomFilter`` is gone in 4.x and
    ``bloom_filter_agg``/``might_contain`` are unregistered internals), so
    the filter is built from public primitives; the probe is the one
    Python step, Arrow-batched and numpy-vectorized.

    The bench shingle chain (tokenize → shingle → md5) is the most
    expensive expression here and is consumed by up to three jobs (the
    sizing count, the bitmap build, the verify join), so it is
    localCheckpointed once instead of recomputed per job. The bitmap
    broadcast lives until the application ends (Spark broadcasts have
    no scoped lifetime while the returned plan may still execute) —
    reuse the returned DataFrame rather than calling repeatedly when
    the filter is large."""
    from pyspark.sql.functions import pandas_udf

    spark = train_sh.sparkSession
    bench_sh = bench_sh.localCheckpoint(eager=False)
    n = expected_items if expected_items is not None else bench_sh.count()
    if n <= 0:
        # empty benchmark ⇒ nothing can be contaminated
        return train_sh.join(bench_sh, "__h")
    m, k = _bloom_params(n, fpp)

    def positions(col: Column) -> list[Column]:
        # k independent probe positions; the seed literal participates in
        # the xxhash64 input tuple, giving k distinct hash functions
        return [F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m)) for seed in range(k)]

    # build: (word index, bit) per probe position, OR-folded per word by a
    # primitive hash aggregate (map-side combined); the collect is the
    # folded bitmap, ≈ m/64 longs, NOT the hash set
    pos = bench_sh.select(
        F.explode(F.array(*positions(F.col("__h")))).alias("__p")
    )
    words = (
        pos.select(
            F.shiftright(F.col("__p"), 6).alias("__w"),
            # F.shiftleft only takes a literal shift count; the column-
            # valued count needs the SQL form
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))").alias("__b"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__bits"))
        .collect()
    )
    # int64 throughout: numpy silently promotes uint64⊕int64 to float64
    bitmap = np.zeros(m // 64, dtype=np.int64)
    for r in words:
        bitmap[r["__w"]] = r["__bits"]
    bc = spark.sparkContext.broadcast(bitmap.tobytes())

    @pandas_udf("boolean")
    def might_contain(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        bm = np.frombuffer(bc.value, dtype=np.int64)
        mat = np.vstack(pos.to_numpy())  # (rows, k) int64 probe positions
        # arithmetic right shift then &1 reads bit s exactly for s∈[0,63]
        bits = (bm[mat >> 6] >> (mat & 63)) & 1
        return pd.Series(bits.all(axis=1))

    survivors = train_sh.filter(
        might_contain(F.array(*positions(F.col("__h"))))
    )
    # exact verify: fpp sized the survivor set, not the result
    return survivors.join(bench_sh, "__h")


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_para: int = 10,
    sep: str = " ",
) -> DataFrame:
    """Corpus-level EXACT PARAGRAPH dedup — the sub-document curation
    pass large training-data pipelines run after document-level dedup
    (boilerplate paragraphs repeat across pages that are not document
    duplicates). Documents are split into "paragraphs" (disjoint
    ``words_per_para``-word chunks on ``sep`` — a deterministic stand-in
    for the newline split real corpora use, since the fixtures carry no
    newlines), each paragraph's FIRST corpus occurrence (ordered by
    ``(doc id, position)``) is kept, every later copy anywhere in the
    corpus is dropped, and each document is reassembled from its
    surviving paragraphs in original order.

    Returns ``(id_col, cleaned_text, kept_paragraphs)`` for documents
    with at least one surviving paragraph.

    100 TB shape: the explode is shuffle-free and drops the text
    immediately — only ``(digest, bit-packed (id, pos))`` ever reach a
    digest-keyed shuffle. The winner pick is a PRIMITIVE
    ``min(id·2²¹ + pos)`` whole-stage-codegen HASH aggregate whose
    map-side combine collapses even a corpus-wide boilerplate paragraph
    (the skew case) to one row per mapper before the shuffle; surviving
    positions regroup per document (tiny rows), and the text is
    rebuilt by ONE skew-free id-keyed join against the original
    documents (one row per doc on both sides) that re-slices the kept
    chunks in place. Paragraph text never crosses a digest-keyed wire
    at all (measured against a ``row_number()``-per-digest naive twin:
    scripts/scale_smoke_paragraph_skew.py). Document ids must be in
    ``[0, 2⁴²)`` (the packed ``id·2²¹ + pos`` long leaves 42 id bits)
    and positions below 2²¹ (≥ 20 M words per document at the default
    chunking) — violations raise, never corrupt. The digest pair is two
    independently-seeded xxhash64 lanes (salt-first second lane), so a
    silent paragraph merge requires a simultaneous collision in both
    64-bit lanes.
    """
    # F.split interprets its pattern as a Java regex while array_join
    # (reassembly) and the DuckDB oracle's string_split are literal — an
    # unescaped sep='.' or '|' would silently split on every character.
    # re.escape's backslash-quoting of punctuation is valid Java regex.
    import re as _re

    toks = F.split(F.col(text_col), _re.escape(sep))
    n_para = F.ceil(F.size(toks) / F.lit(words_per_para)).cast("int")
    # Round-7 restructure, measured by scripts/scale_smoke_paragraph_skew
    # .py: the r6 agg+join form recomputed the explode twice and its
    # 10 M-row join build side was statically mis-estimated UNDER the
    # broadcast threshold (AQE never demotes a chosen broadcast — an OOM
    # hazard at scale); carrying the winner's TEXT through the aggregate
    # instead forces SortAggregate (strings have no mutable hash-agg
    # buffer), i.e. two extra full-corpus sorts. So the winner pick
    # ships NOTHING but digests and bit-packed (id, pos): a primitive
    # ``min(id·2²¹ + pos)`` keeps the aggregate a whole-stage-codegen
    # HASH aggregate whose map-side combine collapses a corpus-wide
    # boilerplate paragraph to one row per mapper, and the text never
    # crosses the wire at all until the final SKEW-FREE id-keyed join
    # (one row per doc on both sides) rebuilds the surviving chunks.
    pos_bits = 21
    cap = 1 << pos_bits
    paras = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_para - 1),
                lambda i: F.array_join(
                    F.slice(toks, i * words_per_para + 1, words_per_para), sep
                ),
            )
        ).alias("pos", "para"),
    ).select(
        F.col(id_col),
        F.col("pos"),
        # two 64-bit xxhash64 lanes = a 128-bit identity in 16 bytes.
        # The r6 kernel keyed on sha2 hex — a 64-CHAR string as heavy on
        # the wire as the ten-word paragraph it identifies (measured:
        # the digest shuffle shrank ~3× after this change). Lane
        # independence: Spark folds multi-column xxhash64 SEQUENTIALLY
        # (each column hashed with the running value as seed), so the
        # salt must come FIRST — XX(salt, para) == XX(para,
        # seed=XX(salt, 42)), an independent-seed second lane. The
        # reverse order XX(para, salt) == XX(salt, seed=XX(para, 42))
        # is a pure function of lane 1, which would silently collapse
        # the pair to 64-bit collision resistance (near-certain merges
        # at ~1e11 paragraphs); a regression test pins the seed-fold
        # identity so an argument-order regression cannot reappear.
        F.xxhash64("para").alias("__h1"),
        F.xxhash64(F.lit("xx2"), F.col("para")).alias("__h2"),
    )
    # id < 2^42 keeps id*2^21 + pos inside a signed long; without the
    # upper guard a 64-bit hash id would overflow the (non-ANSI)
    # multiply and silently corrupt winner selection and the unpack.
    id_cap = 1 << (63 - pos_bits)
    packed = F.when(
        (F.col(id_col) >= 0)
        & (F.col(id_col) < F.lit(id_cap))
        & (F.col("pos") < cap),
        F.col(id_col).cast("long") * cap + F.col("pos"),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "paragraph_dedup: id must be in [0, %d) and positions < %d "
                "(id %d, pos %d)",
                F.lit(id_cap), F.lit(cap), F.col(id_col), F.col("pos")
            )
        ).cast("long")
    )
    winners = paras.groupBy("__h1", "__h2").agg(F.min(packed).alias("__w"))
    kept_pos = (
        winners.select(
            F.shiftright("__w", pos_bits).alias(id_col),
            F.col("__w").bitwiseAND(cap - 1).cast("int").alias("pos"),
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("__keep"))
    )
    return df.join(kept_pos, id_col).select(
        F.col(id_col),
        F.array_join(
            F.transform(
                F.col("__keep"),
                lambda p: F.array_join(
                    F.slice(toks, p * words_per_para + 1, words_per_para), sep
                ),
            ),
            sep,
        ).alias("cleaned_text"),
        F.size("__keep").cast("long").alias("kept_paragraphs"),
    )
