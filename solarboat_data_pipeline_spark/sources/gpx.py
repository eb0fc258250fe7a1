"""GPX track source (S4): GPX XML → (timestamp, latitude, longitude, altitude).

The reference shells out to ``gpx_converter`` on the driver
(``lib/process_gpx_data.py:83``). Here the GPX files (small — a track is a
few MB) are parsed with the stdlib XML parser inside ``mapInPandas`` over a
DataFrame of file paths, so many tracks parse in parallel across the
cluster without any extra dependency.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GPX_SCHEMA = (
    "path string, timestamp timestamp, latitude double, longitude double, "
    "altitude double"
)


def _parse_gpx_bytes(path: str, data: bytes) -> pd.DataFrame:
    root = ET.fromstring(data)
    ns = ""
    if root.tag.startswith("{"):
        ns = root.tag.split("}")[0] + "}"
    rows = []
    for pt in root.iter(f"{ns}trkpt"):
        t = pt.find(f"{ns}time")
        ele = pt.find(f"{ns}ele")
        rows.append(
            {
                "path": path,
                "timestamp": pd.Timestamp(t.text).tz_convert("UTC").tz_localize(None)
                if t is not None and "T" in (t.text or "")
                else None,
                "latitude": float(pt.get("lat")),
                "longitude": float(pt.get("lon")),
                "altitude": float(ele.text) if ele is not None else None,
            }
        )
    return pd.DataFrame(rows, columns=["path", "timestamp", "latitude", "longitude", "altitude"])


def scan_gpx(spark: SparkSession, path: str) -> DataFrame:
    """Read one or many GPX files (glob ok) into a track-point DataFrame."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield _parse_gpx_bytes(row["path"], row["content"])

    return files.mapInPandas(parse, schema=GPX_SCHEMA).where(
        F.col("timestamp").isNotNull()
    )
