"""Solar irradiance functions (F7, A7 callers).

The reference computes plane-of-array (POA) irradiance with pvlib physics
(``lib/process_solcast_historic_data.py:20-71``: solar position shifted by
half the data period, extra radiation, kastenyoung1989 airmass, isotropic
transposition) and integrates POA to energy with a cumulative trapezoid.

pvlib is a physics library — it is NOT reimplemented. When installed, the
computation runs as an Arrow-batched ``mapInPandas`` (deterministic per
timestamp+site, so distribution is safe). In environments without pvlib
(such as this build container) ``poa_irradiance`` falls back to a
clearly-marked deterministic approximation so the Spark-side plumbing
(schema, batching, column contract) stays real and tested: for the
reference's horizontal panel (surface_tilt=0) isotropic POA ≈ GHI.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - exercised only where pvlib exists
    import pvlib  # type: ignore

    HAVE_PVLIB = True
except Exception:  # pragma: no cover
    pvlib = None
    HAVE_PVLIB = False

SOLCAST_RENAMES = {
    "Dni": "dni",
    "Ghi": "ghi",
    "Dhi": "dhi",
    "Airmass": "airmass",
    "AlbedoDaily": "albedo",
}


def solcast_preprocess(df: DataFrame, ts_col: str = "PeriodStart") -> DataFrame:
    """S3/P13/P14: Solcast CSV → normalized forecast table
    (``lib/process_solcast_historic_data.py:77-93``): drop PeriodEnd/Period,
    rename to lowercase, parse the timestamp."""
    out = df
    for old, new in SOLCAST_RENAMES.items():
        if old in out.columns:
            out = out.withColumnRenamed(old, new)
    drop = [c for c in ("PeriodEnd", "Period") if c in out.columns]
    out = out.drop(*drop)
    return out.withColumn("timestamp", F.to_timestamp(ts_col)).drop(ts_col)


def poa_irradiance(
    df: DataFrame,
    latitude: float,
    longitude: float,
    tz: str = "America/Sao_Paulo",
    surface_tilt: float = 0.0,
    surface_azimuth: float = 0.0,
    period_seconds: float = 300.0,
    ts_col: str = "timestamp",
) -> DataFrame:
    """F7: POA irradiance per row. pvlib path when available; documented
    deterministic fallback otherwise (horizontal isotropic ≈ GHI)."""
    if not HAVE_PVLIB:
        # DETERMINISTIC FALLBACK (pvlib absent): tilt-0 isotropic POA equals
        # sky-diffuse + horizontal beam ≈ GHI. Real physics requires pvlib.
        return df.withColumn("poa", F.col("ghi").cast("double"))

    schema = T.StructType(
        df.schema.fields + [T.StructField("poa", T.DoubleType())]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        site = pvlib.location.Location(latitude, longitude, tz=tz)
        for pdf in batches:
            if pdf.empty:
                yield pdf.assign(poa=pd.Series(dtype="float64"))
                continue
            idx = pd.DatetimeIndex(pdf[ts_col]).tz_localize("UTC").tz_convert(tz)
            # solar position computed at T/2-shifted timestamps, reported at
            # the originals (lib/process_solcast_historic_data.py:41-47)
            shifted = idx + pd.Timedelta(seconds=period_seconds / 2)
            pos = site.get_solarposition(shifted)
            pos.index = idx
            dni_extra = pvlib.irradiance.get_extra_radiation(idx)
            air = site.get_airmass(times=idx, solar_position=pos, model="kastenyoung1989")
            poa = pvlib.irradiance.get_total_irradiance(
                surface_tilt=surface_tilt,
                surface_azimuth=surface_azimuth,
                solar_zenith=pos["apparent_zenith"],
                solar_azimuth=pos["azimuth"],
                dni=pdf["dni"].values,
                ghi=pdf["ghi"].values,
                dhi=pdf["dhi"].values,
                dni_extra=dni_extra,
                airmass=air,
                albedo=pdf["albedo"].values,
                surface_type="sea",
                model="isotropic",
            )
            yield pdf.assign(poa=poa["poa_global"].values)

    return df.mapInPandas(compute, schema=schema)
