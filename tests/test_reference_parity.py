"""Parity against the reference's OWN schema files and adversarial corpus,
read directly from the read-only checkout at /root/reference (never copied).
Skipped when the checkout is absent."""

import os

import pytest
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.catalog import CanCatalog
from solarboat_data_pipeline_spark.operators.parse import (
    decode_long,
    with_frame_meta,
    with_timestamp,
)
from solarboat_data_pipeline_spark.sources.candump import extract_frames, scan_candump

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)


def test_loads_all_reference_schemas():
    # 2022 schema: 24 modules, 56 topics (SURVEY §1.3); loader must accept
    # every shipped schema file and produce a unique static wide schema
    for fname, min_topics in [
        ("can_ids_2020.json", 10),
        ("can_ids_2022.json", 50),
        ("can_ids_lic_01072023.json", 10),
    ]:
        cat = CanCatalog.load(os.path.join(REF, fname))
        topics = list(cat.iter_topics())
        assert len(topics) >= min_topics, fname
        cols = cat.wide_columns()
        assert len(cols) == len(set(cols)), f"{fname}: duplicate wide columns"


def test_decodes_reference_adversarial_corpus(spark):
    # test_small.log (31 lines): concatenated frames, bad interface µan0,
    # oversize/odd/non-hex payloads, truncated lines. The regex must keep
    # exactly the well-formed frames, and the 2020 schema must decode the
    # known-module subset.
    cat = CanCatalog.load(os.path.join(REF, "can_ids_2020.json"))
    lines = scan_candump(spark, os.path.join(REF, "test_small.log"))
    frames = extract_frames(lines)
    n_frames = frames.count()
    # line 1 holds two concatenated frames; garbage lines contribute none.
    # Ground truth = 12: the reference pattern (re.IGNORECASE|re.ASCII,
    # lib/canparser.py:274-283) run over the corpus with re.findall.
    assert frames.where(F.col("_line_id") == 0).count() == 2
    assert n_frames == 12

    decoded = decode_long(
        with_frame_meta(with_timestamp(frames)), cat
    )
    rows = decoded.count()
    assert rows > 0
    # every decoded signal belongs to a catalog module
    mods = {m.name for m, _ in cat.iter_topics()}
    got_mods = {
        r["module_name"]
        for r in decoded.select("module_name").distinct().collect()
    }
    assert got_mods <= mods and got_mods
