"""Formatting / conversion expressions (F5, F6, K4 building blocks)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def payload_from_int_array(bytes_col: Column, module_col: Column) -> Column:
    """F5/F6: ``[159, 4, 246, ...]`` + module id → lowercase hex payload
    with the module signature byte prepended
    (``convert_json_to_candump.py:82-95``: ``module + ''.join('%02x')``)."""
    hex_bytes = F.transform(
        bytes_col, lambda b: F.lpad(F.lower(F.hex(b.cast("int"))), 2, "0")
    )
    mod_hex = F.lpad(F.lower(F.hex(module_col.cast("int"))), 2, "0")
    return F.concat(mod_hex, F.array_join(hex_bytes, ""))


def candump_line(
    ts_epoch: Column, topic_id: Column, payload_hex: Column, interface: str = "can0"
) -> Column:
    """K4: format a frame back into candump text
    (``convert_json_to_candump.py:96``): ``(%10.6f) can0 %03x#%s``."""
    topic_hex = F.lpad(F.lower(F.hex(topic_id.cast("int"))), 3, "0")
    return F.format_string(
        f"(%10.6f) {interface} %s#%s", ts_epoch, topic_hex, payload_hex
    )


def epoch_seconds(ts: Column) -> Column:
    """Timestamp → epoch seconds as double with µs fraction preserved.

    NTZ-tolerant: naive-parquet fixtures read as ``TIMESTAMP_NTZ``, which
    ``unix_micros`` rejects; the cast is a no-op for ``TIMESTAMP`` inputs
    and interprets NTZ in the (UTC) session timezone otherwise.
    """
    return F.unix_micros(ts.cast("timestamp")) / 1_000_000.0
