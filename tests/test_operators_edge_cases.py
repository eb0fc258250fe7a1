"""Edge-case semantics for the dedup / text / similarity / timeseries
operators: empty documents, single tokens, identical docs, all-null
columns — the inputs most likely to surprise a driver run."""

import math

from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators import dedup as dd
from solarboat_data_pipeline_spark.operators import similarity as sim
from solarboat_data_pipeline_spark.operators import text as tx
from solarboat_data_pipeline_spark.operators import timeseries as ts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_empty_and_short_docs(spark):
    docs = _docs(
        spark,
        [(1, "one two three four"), (2, ""), (3, "only two"), (4, "one two three four")],
    )
    m = {r["doc_id"]: r["minhash"] for r in dd.with_minhash(docs).collect()}
    assert m[2] is None  # no tokens → no signature
    assert m[3] is None  # < 3 tokens → no shingles
    assert m[1] is not None and len(m[1]) == dd.NUM_HASHES
    assert m[1] == m[4]  # identical docs → identical signatures


def test_lsh_identical_docs_pair(spark):
    docs = _docs(
        spark,
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "totally different words here now")],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in dd.lsh_candidate_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_simhash_empty_doc_null(spark):
    docs = _docs(spark, [(1, "w"), (2, "")])
    s = {r["doc_id"]: r["simhash"] for r in dd.with_simhash(docs).collect()}
    assert s[1] is not None
    assert s[2] is None


def test_connected_components_two_chains(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.connected_components(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_driver_and_distributed_paths_agree(spark):
    # long chain (worst diameter) + star + singleton pair, shuffled order
    edges = [(i, i + 1) for i in range(20, 0, -2)]
    edges += [(i + 1, i + 2) for i in range(20, 0, -2)]
    edges += [(100, x) for x in (104, 102, 103)] + [(200, 201)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    via_driver = {
        (r["doc_id"], r["cluster_id"])
        for r in dd.connected_components(pairs).collect()
    }
    via_loop = {
        (r["doc_id"], r["cluster_id"])
        for r in dd.connected_components(pairs, driver_threshold=0).collect()
    }
    assert via_driver == via_loop
    # the 2..22 chain collapses to one component rooted at its minimum
    assert all(c == 2 for d, c in via_driver if d <= 22)


def test_exact_dedup_groups(spark):
    docs = _docs(spark, [(5, "x"), (9, "x"), (7, "y")])
    rows = {r["digest"]: r for r in dd.exact_dedup(docs).collect()}
    assert len(rows) == 2
    by_n = sorted((r["n_dups"], r["keep_id"]) for r in rows.values())
    assert by_n == [(1, 7), (2, 5)]  # keep the lowest id of the dup pair


def test_lang_id_and_quality_on_known_text(spark):
    docs = _docs(
        spark,
        [
            (1, "the cat and the dog sat in the garden"),
            (2, "el perro y el gato en la casa es un amigo"),
            (3, "zzz qqq www"),
            (4, ""),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            tx.lang_id(F.col("text")).alias("lang"),
            tx.token_count(F.col("text")).alias("n"),
        ).collect()
    }
    assert out[1]["lang"] == "en"
    assert out[2]["lang"] == "es"
    assert out[3]["lang"] == tx.DEFAULT_LANG
    assert out[4]["n"] == 0


def test_cosine_topk_on_known_vectors(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = sim.cosine_topk(emb, query_ids=[0], k=3).collect()
    order = [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert order == [1, 2, 3]
    assert math.isclose(rows[0]["cosine_sim"], 0.993884, abs_tol=1e-6)


def test_interpolate_all_null_column_stays_null(spark):
    df = spark.createDataFrame(
        [(i, None) for i in range(5)], "epoch long, v double"
    ).select(F.timestamp_seconds("epoch").alias("timestamp"), "v")
    out = ts.interpolate_time(df, value_cols=["v"])
    assert all(r["v"] is None for r in out.collect())


def test_resample_empty_frame(spark):
    df = spark.createDataFrame([], "timestamp timestamp, v double")
    out = ts.resample_mean(df, 1.0, value_cols=["v"])
    assert out.count() == 0


def test_asof_backward_empty_right(spark):
    left = spark.createDataFrame(
        [(i,) for i in range(3)], "epoch long"
    ).select(F.timestamp_seconds("epoch").alias("timestamp"))
    right = spark.createDataFrame([], "timestamp timestamp, v double")
    out = ts.asof_join_backward(left, right, value_cols=["v"])
    assert out.count() == 3
    assert all(r["v"] is None for r in out.collect())


def test_simhash_wide_bits_and_cap(spark):
    # the corpus-scale recommendation (48/60-bit signatures) must work;
    # bits > 63 must fail loudly, not with a lit() overflow deep in Spark
    import pytest as _pytest

    from solarboat_data_pipeline_spark.operators.dedup import (
        simhash_near_dup_pairs,
        simhash_table,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumped over the lazy dog"),
            (3, "completely different text with other words entirely"),
        ],
        ["doc_id", "text"],
    )
    for bits in (48, 60, 63):
        sh = {r["doc_id"]: r["simhash"] for r in simhash_table(df, bits=bits).collect()}
        assert len(sh) == 3 and all(v is not None for v in sh.values())
    pairs = simhash_near_dup_pairs(df, max_hamming=3, bits=48, bands=4).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got and (1, 3) not in got
    with _pytest.raises(ValueError, match=r"bits \(64\)"):
        simhash_table(df, bits=64)
