"""Unit tests for deterministic sampling / mixing and corpus-hygiene
operators (decontamination, PII redaction), verified against independent
pure-Python reference implementations."""

import hashlib

from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators import dedup as dd
from solarboat_data_pipeline_spark.operators import sampling as sp
from solarboat_data_pipeline_spark.operators import text as tx

# ---------------------------------------------------------------------------
# pure-Python spec
# ---------------------------------------------------------------------------


def py_bucket(key, salt=""):
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16) % 10_000


def py_shingles(text, k=3):
    toks = [t for t in text.lower().split() if t]
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def py_h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_hash_sample_matches_python_bucket_spec(spark):
    df = spark.range(500).select(F.col("id").alias("k"))
    got = {r["k"] for r in sp.hash_sample(df, "k", 0.3, salt="s").collect()}
    want = {i for i in range(500) if py_bucket(i, "s") < 3000}
    assert got == want
    assert 0 < len(got) < 500  # sanity: rate is neither 0 nor 1


def test_hash_sample_invariant_under_partitioning(spark):
    df = spark.range(500).select(F.col("id").alias("k"))
    a = {r["k"] for r in sp.hash_sample(df, "k", 0.3).collect()}
    b = {r["k"] for r in sp.hash_sample(df.repartition(7), "k", 0.3).collect()}
    assert a == b


def test_weighted_mix_per_source_rates(spark):
    rows = [(i, f"src{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, ["k", "src"])
    rates = {"src0": 0.9, "src1": 0.4, "src2": 0.1}  # src3 absent → dropped
    got = {r["k"] for r in sp.weighted_mix(df, "src", "k", rates).collect()}
    want = {
        k
        for k, s in rows
        if s in rates and py_bucket(k) < int(rates[s] * 10_000)
    }
    assert got == want
    assert not any(k % 4 == 3 for k in got)


def test_stratified_sample_exact_quota_and_selection(spark):
    rows = [(i, f"g{i % 5}") for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "g"])
    got = {}
    for r in sp.stratified_sample(df, "g", "k", 3, salt="q").collect():
        got.setdefault(r["g"], set()).add(r["k"])
    for g in {f"g{i}" for i in range(5)}:
        members = [k for k, s in rows if s == g]
        want = set(sorted(members, key=lambda k: (py_bucket(k, "q"), k))[:3])
        assert got[g] == want, g


def test_token_budget_sample_greedy_prefix(spark):
    rows = [(i, f"g{i % 3}", (i * 7) % 90 + 10) for i in range(120)]
    df = spark.createDataFrame(rows, ["k", "g", "n_tok"])
    budget = 300
    got = {}
    for r in sp.token_budget_sample(
        df, budget, "n_tok", "k", strata_col="g", salt="b"
    ).collect():
        got.setdefault(r["g"], []).append((r["k"], r["n_tok"]))
    for g in {f"g{i}" for i in range(3)}:
        members = sorted(
            ((k, n) for k, s, n in rows if s == g),
            key=lambda kn: (py_bucket(kn[0], "b"), kn[0]),
        )
        # python replication of the greedy prefix
        want, cum = [], 0
        for k, n in members:
            cum += n
            if cum > budget:
                break
            want.append((k, n))
        assert sorted(got.get(g, [])) == sorted(want), g
        assert sum(n for _, n in want) <= budget


def test_token_budget_bucketed_matches_global(spark):
    """The hash-range-bucketed prefix scan must keep the IDENTICAL row
    set as the single-window global form, across bucket counts (including
    more buckets than distinct hash values land in)."""
    rows = [(i, f"g{i % 3}", (i * 7) % 90 + 10) for i in range(300)]
    df = spark.createDataFrame(rows, ["k", "g", "n_tok"]).repartition(7)
    budget = 700
    want = sorted(
        (r["g"], r["k"], r["n_tok"])
        for r in sp.token_budget_sample(
            df, budget, "n_tok", "k", strata_col="g", salt="b"
        ).collect()
    )
    for nb in (1, 4, 64):
        got = sorted(
            (r["g"], r["k"], r["n_tok"])
            for r in sp.token_budget_sample_bucketed(
                df, budget, "n_tok", "k", strata_col="g", salt="b",
                num_buckets=nb,
            ).collect()
        )
        assert got == want, f"num_buckets={nb}"
    # global (no strata) path too
    want_g = sorted(
        r["k"]
        for r in sp.token_budget_sample(df, budget, "n_tok", "k", salt="b").collect()
    )
    got_g = sorted(
        r["k"]
        for r in sp.token_budget_sample_bucketed(
            df, budget, "n_tok", "k", salt="b", num_buckets=8
        ).collect()
    )
    assert got_g == want_g


def test_shard_corpus_matches_python_spec_and_is_layout_invariant(spark):
    df = spark.range(400).select(F.col("id").alias("doc_id"))
    want = {}
    per_shard = {}
    for i in range(400):
        h = py_h32("sX" + str(i))
        per_shard.setdefault(h % 8, []).append((h, i))
    for s, rows in per_shard.items():
        for pos, (_, i) in enumerate(sorted(rows)):
            want[i] = (s, pos)
    for n_parts in (1, 7, 32):
        out = sp.shard_corpus(
            df.repartition(n_parts), n_shards=8, key_col="doc_id", salt="sX"
        )
        got = {r["doc_id"]: (r["shard"], r["shard_pos"]) for r in out.collect()}
        assert got == want, n_parts  # exact, every row once, layout-proof
    # positions are dense 0..len-1 per shard
    sizes = {}
    for s, _ in want.values():
        sizes[s] = sizes.get(s, 0) + 1
    for s, rows in per_shard.items():
        assert sorted(p for sh, p in want.values() if sh == s) == list(
            range(sizes[s])
        )


def test_pack_sequences_matches_python_spec(spark):
    sizes = {i: (i * 7) % 11 for i in range(200)}  # includes 0-token docs
    df = spark.createDataFrame(
        [(i, n) for i, n in sizes.items()], ["doc_id", "n_tok"]
    )
    order = sorted(sizes, key=lambda i: (py_h32("pk" + str(i)), i))
    want, cum = {}, 0
    B = 16
    for i in order:
        n = sizes[i]
        last = (cum + n - 1) // B if n > 0 else cum // B
        want[i] = (cum, cum // B, last, cum % B)
        cum += n
    for n_parts in (1, 13):
        out = sp.pack_sequences(
            df.repartition(n_parts), B, "n_tok", key_col="doc_id", salt="pk",
            num_buckets=8,
        )
        got = {
            r["doc_id"]: (r["start_tok"], r["block_first"],
                          r["block_last"], r["block_offset"])
            for r in out.collect()
        }
        assert got == want, n_parts
    # the stream is gapless: total tokens == sum of sizes; consecutive
    # docs' slices tile it exactly (implied by start == python cumsum)
    assert cum == sum(sizes.values())


def test_pack_sequences_per_shard_streams_are_self_contained(spark):
    """partition_col='shard' must give every shard its OWN gapless
    0-based token stream (the dataloader contract): within each shard,
    sorted by start_tok, each doc starts where the previous ended."""
    sizes = {i: (i * 13) % 9 + 1 for i in range(150)}
    df = spark.createDataFrame(
        [(i, n) for i, n in sizes.items()], ["doc_id", "n_tok"]
    )
    out = sp.pack_sequences(
        sp.shard_corpus(df, 4, salt="e"), 16, "n_tok", salt="e",
        partition_col="shard", num_buckets=8,
    ).collect()
    per_shard = {}
    for r in out:
        per_shard.setdefault(r["shard"], []).append(r)
    assert len(out) == 150 and len(per_shard) == 4
    for s, rows in per_shard.items():
        rows.sort(key=lambda r: r["start_tok"])
        cum = 0
        for r in rows:
            assert r["start_tok"] == cum, (s, r)  # gapless per shard
            assert r["block_offset"] == cum % 16
            cum += sizes[r["doc_id"]]
        # python replica of the per-shard hash order
        order = sorted(
            (r["doc_id"] for r in rows),
            key=lambda i: (py_h32("e" + str(i)), i),
        )
        assert [r["doc_id"] for r in rows] == order


def test_pack_sequences_guards(spark):
    df = spark.createDataFrame([(1, 5)], ["doc_id", "n_tok"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="block_tokens"):
        sp.pack_sequences(df, 0, "n_tok")


def test_shard_corpus_salt_reshuffles_and_guards(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: (r["shard"], r["shard_pos"])
         for r in sp.shard_corpus(df, 8, salt="ep0").collect()}
    b = {r["doc_id"]: (r["shard"], r["shard_pos"])
         for r in sp.shard_corpus(df, 8, salt="ep1").collect()}
    assert a != b and set(a) == set(b)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_shards"):
        sp.shard_corpus(df, 0)


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_counts_shared_distinct_shingles(spark):
    bench_rows = [(100, "alpha beta gamma delta epsilon")]
    train_rows = [
        # shares shingles "alpha beta gamma", "beta gamma delta" with bench
        (1, "zz alpha beta gamma delta yy"),
        # no 3-gram overlap
        (2, "entirely different words here now"),
        # duplicated overlap region still counts each DISTINCT shingle once
        (3, "alpha beta gamma xx alpha beta gamma"),
    ]
    bench = spark.createDataFrame(bench_rows, ["doc_id", "text"])
    train = spark.createDataFrame(train_rows, ["doc_id", "text"])
    got = {r["id"]: r["n_contaminated"] for r in dd.decontaminate(train, bench).collect()}
    bench_sh = py_shingles(bench_rows[0][1])
    want = {
        i: len(py_shingles(t) & bench_sh)
        for i, t in train_rows
        if py_shingles(t) & bench_sh
    }
    assert got == want
    assert 2 not in got  # clean docs don't appear


def _decon_fixture(spark, n_train=60, n_bench=4):
    # every 7th train doc shares a 3-gram run with some bench doc
    bench_rows = [
        (1000 + b, f"mark{b} alpha{b} beta{b} gamma{b} delta{b}")
        for b in range(n_bench)
    ]
    train_rows = []
    for i in range(n_train):
        if i % 7 == 0:
            b = i % n_bench
            train_rows.append((i, f"pre{i} alpha{b} beta{b} gamma{b} post{i}"))
        else:
            train_rows.append((i, f"clean{i} words{i} only{i} here{i} now{i}"))
    bench = spark.createDataFrame(bench_rows, ["doc_id", "text"])
    train = spark.createDataFrame(train_rows, ["doc_id", "text"])
    bench_sh = set().union(*(py_shingles(t) for _, t in bench_rows))
    want = {
        i: len(py_shingles(t) & bench_sh)
        for i, t in train_rows
        if py_shingles(t) & bench_sh
    }
    return train, bench, want


def test_decontaminate_strategies_agree_and_match_spec(spark):
    train, bench, want = _decon_fixture(spark)
    for strategy in ("broadcast", "shuffle", "bloom"):
        got = {
            r["id"]: r["n_contaminated"]
            for r in dd.decontaminate(train, bench, strategy=strategy).collect()
        }
        assert got == want, strategy


def test_decontaminate_bloom_exact_even_at_terrible_fpp(spark):
    # a near-saturated filter (fpp→1) passes almost everything through to
    # the verify join; the RESULT must not change — fpp sizes the shuffle,
    # never the answer
    train, bench, want = _decon_fixture(spark)
    got = {
        r["id"]: r["n_contaminated"]
        for r in dd.decontaminate(
            train, bench, strategy="bloom", fpp=0.99
        ).collect()
    }
    assert got == want
    # and with expected_items wildly understated (undersized bitmap)
    got2 = {
        r["id"]: r["n_contaminated"]
        for r in dd.decontaminate(
            train, bench, strategy="bloom", expected_items=1
        ).collect()
    }
    assert got2 == want


def test_decontaminate_bloom_empty_benchmark(spark):
    train = spark.createDataFrame([(1, "some words here again")], ["doc_id", "text"])
    bench = spark.createDataFrame([], "doc_id long, text string")
    assert dd.decontaminate(train, bench, strategy="bloom").count() == 0


def test_decontaminate_unknown_strategy_raises(spark):
    train = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown decontaminate strategy"):
        dd.decontaminate(train, train, strategy="sort")


def test_decontaminate_strategy_plan_shapes(spark):
    from solarboat_data_pipeline_spark.plans.audit import audit

    train, bench, _ = _decon_fixture(spark)
    a_b = audit(dd.decontaminate(train, bench, strategy="broadcast"))
    assert a_b.broadcast_join
    a_s = audit(dd.decontaminate(train, bench, strategy="shuffle"))
    assert "ShuffledHashJoin" in a_s.plan, a_s.plan
    assert not a_s.broadcast_join
    a_f = audit(dd.decontaminate(train, bench, strategy="bloom"))
    # the probe is the sanctioned Arrow path and sits BEFORE the join
    assert "ArrowEvalPython" in a_f.plan, a_f.plan
    assert "BatchEvalPython" not in a_f.plan


def test_bloom_params_standard_sizing():
    m, k = dd._bloom_params(1_000_000, 0.01)
    assert 9_585_000 < m < 9_600_000  # ≈ 9.59 bits/item
    assert k == 7
    assert m % 64 == 0
    m2, k2 = dd._bloom_params(1, 0.5)
    assert m2 == 64 and 1 <= k2 <= 8


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_pii_golden_cases(spark):
    cases = [
        ("mail me at jo.do+spam@sub.ex-corp.io today", "mail me at <EMAIL> today"),
        ("call 555 123 4567 or 555-123-4567", "call <PHONE> or <PHONE>"),
        ("account 1234567 balance 12345", "account <NUM> balance 12345"),
        ("no pii here", "no pii here"),
        # email wins over the digit rules inside the address
        ("x 12345678@example.com y", "x <EMAIL> y"),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(cases)], ["i", "s"])
    got = {r["i"]: r["out"] for r in df.select("i", tx.redact_pii(F.col("s")).alias("out")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}"
