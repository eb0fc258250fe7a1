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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators.text import h32, tokens, word_shingles

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
SIMHASH_BITS = 16

# MinHash permutations: ONE md5 per shingle, then cheap integer mixing
# h_j = (A[j]*h + B[j]) mod P per permutation — 16× fewer digest
# computations than hashing per permutation, and still exactly
# reproducible in SQL. P = 2^61-1 (Mersenne); A < 2^30 keeps A*h < 2^62.
MINHASH_P = (1 << 61) - 1


def _perm_constants(num_hashes: int = NUM_HASHES) -> list[tuple[int, int]]:
    import hashlib as _hl

    out = []
    for j in range(num_hashes):
        a = (int(_hl.md5(f"a{j}".encode()).hexdigest()[:8], 16) % (1 << 30)) | 1
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


def minhash_signature(text: Column, num_hashes: int = NUM_HASHES) -> Column:
    """MinHash signature as an array<long> of per-permutation minima over
    the distinct word-3-gram shingle set. Documents with no shingles get
    nulls (can't be near-dup candidates)."""
    sh = F.array_distinct(word_shingles(tokens(text)))
    base = F.transform(sh, lambda s: h32(s))  # one digest per shingle

    def perm(a: int, b: int):
        # closure helper: a default-arg lambda would become a 2-arg lambda
        # and Spark would bind the array index to it
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)

    mins = [
        F.when(F.size(sh) > 0, F.array_min(F.transform(base, perm(a, b))))
        for a, b in PERM_CONSTANTS[:num_hashes]
    ]
    return F.array(*mins)


def with_minhash(
    df: DataFrame, text_col: str = "text", out_col: str = "minhash"
) -> DataFrame:
    return df.withColumn(out_col, minhash_signature(F.col(text_col)))


def band_hashes(sig: Column, bands: int = BANDS, rows: int = ROWS_PER_BAND) -> Column:
    """LSH band digests: md5 over each band's slice of the signature."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(sig, b * rows + r + 1).cast("string")
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
    sharing at least one band bucket."""
    sig = df.select(
        F.col(id_col),
        band_hashes(minhash_signature(F.col(text_col))).alias("bands"),
        F.size(F.array_distinct(word_shingles(tokens(F.col(text_col))))).alias(
            "n_sh"
        ),
    ).where(F.col("n_sh") > 0)
    exploded = sig.select(
        id_col, F.posexplode("bands").alias("band", "band_hash")
    )
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


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over the (multiset of) tokens: bit b set when more token
    hashes have bit b set than not."""
    toks = tokens(text)
    hashes = F.transform(toks, lambda t: h32(t))  # one digest per token
    n = F.size(toks)

    def bit_set(b: int):
        return lambda h: F.shiftright(h, b).bitwiseAND(1) == 1

    acc = F.lit(0).cast("long")
    for b in range(bits):
        pos = F.size(F.filter(hashes, bit_set(b)))
        acc = acc + F.when(pos * 2 > n, F.lit(1 << b)).otherwise(F.lit(0)).cast(
            "long"
        )
    return F.when(n > 0, acc)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs ≥ threshold, via a
    shingle-posting self-join: |A∩B| from shared shingles, |A∪B| from set
    sizes. Returns (id_a, id_b, jaccard)."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col(text_col))))
        ).alias("sh"),
    )
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
