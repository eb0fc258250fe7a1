"""Catalog loading, ctypes-layout parity, and unit-scaling quirks."""

import math
import os

import pytest

from solarboat_data_pipeline_spark.catalog import (
    CanCatalog,
    _layout_fields,
    apply_units,
    unit_scale,
)

from tests.conftest import DATA_DIR

MINI = os.path.join(DATA_DIR, "mini_can_ids.json")
REFERENCE_DIR = "/root/reference"


def test_apply_units_reference_cases():
    # ported from the reference's own unit tests (lib/tests/test_canparser_generator.py)
    assert apply_units("", 100) == ("", 100)
    u, v = apply_units("%", 100)
    assert u == "%" and math.isclose(v, 100 / 255)
    u, v = apply_units("A/100", 1500)
    assert u == "A" and math.isclose(v, 15.0)
    u, v = apply_units("%/255", 100)
    assert u == "%" and math.isclose(v, 100 / 255)
    u, v = apply_units("°/100", 200)
    assert u == "°" and math.isclose(v, 2.0)


def test_unit_scale_matches_apply_units():
    for unit in ["", "%", "%/255", "A/100", "V/100", "°/100"]:
        u1, v1 = apply_units(unit, 123)
        u2, s = unit_scale(unit)
        assert u1 == u2
        assert math.isclose(v1, 123 * s)


def test_mini_catalog_layout():
    cat = CanCatalog.load(MINI)
    bat = cat.modules[250]
    adc = bat.topics[33]
    assert adc.size == 7  # 1 + 2 + 2 + 1 + 1 (guard: sum of unit sizes)
    names = [s.name for s in adc.signals]
    assert names == ["SIGNATURE", "AVG", "CUR", "D", "FLAGS"]
    offs = [(s.byte_offset, s.bit_offset) for s in adc.signals]
    assert offs == [(0, 0), (1, 0), (3, 0), (5, 0), (6, 0)]
    # strict-units quirk: D takes bytes[3] (CUR_L, A/100) not its own "%"
    d = adc.signals[3]
    assert d.raw_unit == "A/100" and math.isclose(d.scale, 0.01)
    flags = adc.signals[4]
    assert flags.raw_unit == "A/100" and flags.bit_width == 1

    pumps = cat.modules[230].topics[64]
    # consecutive bitfields pack into byte 1; guard size still counts 3
    assert pumps.size == 3
    offs = [(s.byte_offset, s.bit_offset) for s in pumps.signals]
    assert offs == [(0, 0), (1, 0), (1, 1)]


def test_corrected_units_mode():
    cat = CanCatalog.load(MINI, strict_units=False)
    d = cat.modules[250].topics[33].signals[3]
    assert d.raw_unit == "%" and math.isclose(d.scale, 1 / 255)


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference checkout not present"
)
def test_layout_parity_with_ctypes_on_reference_schemas():
    """Field offsets/values must agree with ctypes LittleEndianStructure
    (the reference's decode machinery) across every topic of every shipped
    schema; the guard size must agree with the reference's sum-of-sizeof."""
    import ctypes
    import json

    cmap = {
        "u8": (ctypes.c_uint8, 8),
        "u16": (ctypes.c_uint16, 16),
        "uint8_t": (ctypes.c_uint8, 8),
        "uint16_t": (ctypes.c_uint16, 16),
        "bitfield": (ctypes.c_uint8, 1),
    }
    for fn in os.listdir(REFERENCE_DIR):
        if not fn.startswith("can_ids") or not fn.endswith(".json"):
            continue
        raw = json.load(open(os.path.join(REFERENCE_DIR, fn)))
        cat = CanCatalog.from_dict(raw)
        for mod in raw["modules"]:
            for top in mod["topics"]:
                fields = []
                for b in top["bytes"]:
                    if not b:
                        continue
                    n = b["name"]
                    if n.endswith("_H"):
                        continue
                    if n.endswith("_L"):
                        n = n[:-2]
                    fields.append((n, *cmap[b["type"]]))
                st = type(
                    "X",
                    (ctypes.LittleEndianStructure,),
                    {"_pack_": 1, "_fields_": fields},
                )
                ref_guard = sum(ctypes.sizeof(f[1]) for f in fields)
                mine = cat.modules[int(mod["signature"])].topics[int(top["id"])]
                assert mine.size == ref_guard, (fn, mod["name"], top["name"])
                layout, _ = _layout_fields(top["bytes"])
                payload = bytes((i * 37 + 11) % 256 for i in range(ctypes.sizeof(st)))
                inst = st.from_buffer_copy(payload)
                for (entry, boff, bitoff), f, sig in zip(layout, fields, mine.signals):
                    expect = getattr(inst, f[0])
                    if sig.bit_width == 16:
                        got = payload[boff] + 256 * payload[boff + 1]
                    elif sig.bit_width == 8:
                        got = payload[boff]
                    else:
                        got = (payload[boff] >> bitoff) & 1
                    assert got == expect, (fn, mod["name"], top["name"], f[0])
