"""GPS scalar functions (F1-F3) and track derivation (W1+A6).

Pure native column expressions — the reference's vectorized numpy math
(``lib/process_gpx_data.py:13-73``) maps 1:1 onto ``pyspark.sql.functions``
trig, so the whole derivation stays JVM-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.operators.timeseries import _us

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """F1: great-circle distance in km (``lib/process_gpx_data.py:26-37``)."""
    rlat1, rlon1 = F.radians(lat1), F.radians(lon1)
    rlat2, rlon2 = F.radians(lat2), F.radians(lon2)
    a = F.pow(F.sin((rlat2 - rlat1) / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(
        F.sin((rlon2 - rlon1) / 2), 2
    )
    return F.lit(EARTH_RADIUS_KM * 2) * F.asin(F.sqrt(a))


def heading_deg(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """F2: GPS heading (``lib/process_gpx_data.py:13-23``).

    Reference quirk preserved verbatim: the y term is
    ``sin(lat1) * (cos(lat1) - cos(lat2)*cos(dlon))`` — not the standard
    great-circle bearing formula — and 180° is added to the atan2 result.
    """
    rlat1, rlon1 = F.radians(lat1), F.radians(lon1)
    rlat2, rlon2 = F.radians(lat2), F.radians(lon2)
    dlon = rlon2 - rlon1
    # + 0.0 folds -0.0 to +0.0: for duplicate consecutive points both args
    # are ±0 and atan2's result flips by π with the sign of zero, which is
    # evaluation-order noise, not signal — pin the degenerate heading to
    # atan2(0, 0) = 0 (→ 180° after the reference's +180 shift)
    x = F.cos(rlat1) * F.sin(dlon) + F.lit(0.0)
    y = F.sin(rlat1) * (F.cos(rlat1) - F.cos(rlat2) * F.cos(dlon)) + F.lit(0.0)
    return F.degrees(F.atan2(x, y)) + F.lit(180.0)


def speed_kmh(distance_km: Column, dt_hours: Column) -> Column:
    """F3: distance/Δt with the 0→null division guard
    (``lib/process_gpx_data.py:59-61``)."""
    return F.when(dt_hours == 0, F.lit(None)).otherwise(distance_km / dt_hours)


def derive_track(
    df: DataFrame,
    ts_col: str = "timestamp",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """W1+F1-F3+A6: per-point speed/heading/cumulative distance
    (``lib/process_gpx_data.py:40-73``).

    Quirks preserved: Δt uses pandas' ``Timedelta.seconds`` — *whole*
    seconds within the day, truncating sub-second parts
    (``lib/process_gpx_data.py:56``); first row of a track has null
    speed/heading; cumulative distance treats the first null step as 0
    (``np.nancumsum``).
    """
    w = Window.partitionBy(*partition_cols).orderBy(ts_col)
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    plat, plon = F.lag(lat_col).over(w), F.lag(lon_col).over(w)
    lat, lon = F.col(lat_col), F.col(lon_col)
    dist = haversine_km(plat, plon, lat, lon)
    dt_us = _us(F.col(ts_col)) - _us(F.lag(ts_col).over(w))
    # pandas .dt.seconds: whole seconds component, modulo one day
    dt_hours = (F.floor(dt_us / 1_000_000) % 86400).cast("double") / 3600.0
    return df.withColumns(
        {
            "speed": speed_kmh(dist, dt_hours),
            "heading": heading_deg(plat, plon, lat, lon),
            "distance": F.sum(F.coalesce(dist, F.lit(0.0))).over(w_cum),
        }
    )
