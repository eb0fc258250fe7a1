"""Solar position + plane-of-array irradiance (F7, A7 callers).

The reference computes POA irradiance with pvlib
(``lib/process_solcast_historic_data.py:20-71``: solar position at
T/2-shifted timestamps, isotropic transposition over a horizontal panel)
and integrates POA to energy with a cumulative trapezoid (``:104``).

This engine implements the physics **as built-in SQL expressions** — the
Spark-first design for per-row math. The solar position is the public
NOAA/Meeus low-accuracy algorithm (declination/eq-of-time/hour-angle →
zenith + azimuth, with the NOAA atmospheric-refraction correction giving
the *apparent* zenith; accuracy vs the full SPA is ~0.01-0.1°, far below
irradiance-model error). The whole chain is plain arithmetic + trig, so:

* on Spark it compiles to whole-stage codegen — **no Python, no UDF,
  no pvlib** on the data path, and it scales like any projection;
* the identical formula text runs in DuckDB, giving F7 an **exact SQL
  oracle** (the chain below is the single source of truth for both).

The isotropic transposition (pvlib ``irradiance.isotropic`` +
beam = dni·cos(aoi), ground = ghi·albedo·(1-cos(tilt))/2) is exact for
the reference's usage; with the reference's ``surface_tilt=0`` the
ground term vanishes and aoi = apparent zenith. ``dni_extra`` and
``airmass`` (computed by the reference) are inputs only to the
perez/haydavies sky models, not the isotropic one it selects, so they
do not appear here.

pvlib remains an OPTIONAL cross-validation engine
(``poa_irradiance(..., engine="pvlib")``, Arrow-batched ``mapInPandas``)
exercised by tests only where pvlib is installed.
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


def _pmod(x: str, y: str) -> str:
    """Positive-definite modulus, identical in both dialects (SQL ``%`` /
    ``mod`` sign conventions differ; floor-based form does not)."""
    return f"(({x}) - floor(({x})/({y}))*({y}))"


# NOAA solar position formula chain (NOAA Solar Calculator / Meeus,
# "Astronomical Algorithms" ch. 25 low-accuracy series; all angles deg).
# Each step is a SQL expression over {ep} (shifted UTC epoch seconds,
# double), {lat}, {lon} (deg, east-positive) and PRIOR step names. The
# same text is evaluated by Spark (F.expr → codegen) and DuckDB (oracle):
# +,*,/ are IEEE-identical across engines, so the only cross-engine
# drift is libm trig ULPs (~1e-13) — callers round outputs well above it.
SOLPOS_STEPS: list[tuple[str, str]] = [
    # Julian century from UTC epoch (JD = ep/86400 + 2440587.5)
    ("__sol_jc", "(({ep})/86400.0 + 2440587.5 - 2451545.0)/36525.0"),
    # geometric mean longitude / anomaly of the sun, orbit eccentricity
    ("__sol_gml", _pmod("280.46646 + __sol_jc*(36000.76983 + __sol_jc*0.0003032)", "360.0")),
    ("__sol_gma", "357.52911 + __sol_jc*(35999.05029 - 0.0001537*__sol_jc)"),
    ("__sol_ecc", "0.016708634 - __sol_jc*(0.000042037 + 0.0000001267*__sol_jc)"),
    # equation of center → true → apparent longitude (Ω = lunar node)
    ("__sol_ceq",
     "sin(radians(__sol_gma))*(1.914602 - __sol_jc*(0.004817 + 0.000014*__sol_jc))"
     " + sin(radians(2.0*__sol_gma))*(0.019993 - 0.000101*__sol_jc)"
     " + sin(radians(3.0*__sol_gma))*0.000289"),
    ("__sol_omg", "125.04 - 1934.136*__sol_jc"),
    ("__sol_sal", "__sol_gml + __sol_ceq - 0.00569 - 0.00478*sin(radians(__sol_omg))"),
    # obliquity (mean → nutation-corrected) → declination
    ("__sol_moe",
     "23.0 + (26.0 + (21.448 - __sol_jc*(46.815 + __sol_jc*(0.00059 - __sol_jc*0.001813)))/60.0)/60.0"),
    ("__sol_obc", "__sol_moe + 0.00256*cos(radians(__sol_omg))"),
    ("declination", "degrees(asin(sin(radians(__sol_obc))*sin(radians(__sol_sal))))"),
    # equation of time (minutes) → true solar time → hour angle
    ("__sol_vy", "tan(radians(__sol_obc/2.0))*tan(radians(__sol_obc/2.0))"),
    ("equation_of_time",
     "4.0*degrees(__sol_vy*sin(2.0*radians(__sol_gml))"
     " - 2.0*__sol_ecc*sin(radians(__sol_gma))"
     " + 4.0*__sol_ecc*__sol_vy*sin(radians(__sol_gma))*cos(2.0*radians(__sol_gml))"
     " - 0.5*__sol_vy*__sol_vy*sin(4.0*radians(__sol_gml))"
     " - 1.25*__sol_ecc*__sol_ecc*sin(2.0*radians(__sol_gma)))"),
    ("__sol_tst",
     _pmod(_pmod("{ep}", "86400.0") + "/60.0 + equation_of_time + 4.0*({lon})", "1440.0")),
    ("__sol_ha", "__sol_tst/4.0 - 180.0"),
    # zenith / elevation (clamped acos argument: ULP overshoot → NaN)
    ("__sol_cosz",
     "greatest(-1.0, least(1.0,"
     " sin(radians({lat}))*sin(radians(declination))"
     " + cos(radians({lat}))*cos(radians(declination))*cos(radians(__sol_ha))))"),
    ("zenith", "degrees(acos(__sol_cosz))"),
    ("elevation", "90.0 - zenith"),
    # NOAA atmospheric refraction (deg) → apparent zenith
    ("__sol_refr",
     "CASE WHEN elevation > 85.0 THEN 0.0"
     " WHEN elevation > 5.0 THEN (58.1/tan(radians(elevation))"
     "   - 0.07/pow(tan(radians(elevation)), 3)"
     "   + 0.000086/pow(tan(radians(elevation)), 5))/3600.0"
     " WHEN elevation > -0.575 THEN (1735.0 + elevation*(-518.2"
     "   + elevation*(103.4 + elevation*(-12.79 + elevation*0.711))))/3600.0"
     " ELSE (-20.774/tan(radians(elevation)))/3600.0 END"),
    ("apparent_zenith", "zenith - __sol_refr"),
    # azimuth (deg clockwise from north), NOAA quadrant resolution.
    # Degenerate denominator (|lat| = 90, or the sun exactly at zenith/
    # nadir) makes the quotient 0/0 — engines disagree on NULL vs NaN
    # there, so the chain pins those rows to a deterministic 180.0°
    # (azimuth is genuinely undefined at the poles; documented limitation)
    ("__sol_azden", "cos(radians({lat}))*sin(radians(zenith))"),
    ("__sol_azr",
     "CASE WHEN abs(__sol_azden) < 1e-12 THEN 0.0"
     " ELSE degrees(acos(greatest(-1.0, least(1.0,"
     " (sin(radians({lat}))*__sol_cosz - sin(radians(declination)))"
     " / __sol_azden)))) END"),
    ("azimuth",
     "CASE WHEN __sol_ha > 0.0 THEN " + _pmod("__sol_azr + 180.0", "360.0")
     + " ELSE " + _pmod("540.0 - __sol_azr", "360.0") + " END"),
]

#: step names exposed to callers (the __sol_* intermediates are dropped)
SOLPOS_OUTPUTS = (
    "declination",
    "equation_of_time",
    "zenith",
    "elevation",
    "apparent_zenith",
    "azimuth",
)

# isotropic POA (pvlib irradiance.get_total_irradiance, model="isotropic"):
# beam = dni·max(cos aoi, 0); sky = dhi·(1+cos tilt)/2;
# ground = ghi·albedo·(1−cos tilt)/2. aoi from apparent zenith + azimuth.
POA_EXPR = (
    "({dni}) * greatest(0.0,"
    " cos(radians(apparent_zenith))*cos(radians({tilt}))"
    " + sin(radians(apparent_zenith))*sin(radians({tilt}))*cos(radians(azimuth - ({saz}))))"
    " + ({dhi}) * (1.0 + cos(radians({tilt})))/2.0"
    " + ({ghi}) * ({albedo}) * (1.0 - cos(radians({tilt})))/2.0"
)


def _fmt(tmpl: str, ep_sql: str, latitude: float, longitude: float) -> str:
    return tmpl.format(ep=ep_sql, lat=repr(float(latitude)), lon=repr(float(longitude)))


def solar_position(
    df: DataFrame,
    latitude: float,
    longitude: float,
    ts_col: str = "timestamp",
    shift_seconds: float = 0.0,
    keep: tuple[str, ...] = ("apparent_zenith", "azimuth"),
) -> DataFrame:
    """Append solar-position columns computed at ``ts + shift_seconds``
    (the reference's T/2 shift) but reported at the original rows.
    Pure built-in expressions — whole-stage codegen, no shuffle.

    Input columns may not collide (case-insensitively — Spark resolution
    is case-insensitive by default) with any chain step name: real
    Solcast exports ship ``Azimuth``/``Zenith`` columns, which
    ``withColumn`` would silently overwrite and the final drop would
    destroy. Rename such columns before calling (e.g.
    ``withColumnRenamed("Azimuth", "solcast_azimuth")``)."""
    step_names = {n.lower() for n, _ in SOLPOS_STEPS}
    clash = sorted(c for c in df.columns if c.lower() in step_names)
    if clash:
        raise ValueError(
            "solar_position would overwrite input column(s) "
            f"{clash} with chain intermediates; rename them first "
            "(Solcast exports include Azimuth/Zenith)"
        )
    # CAST AS DOUBLE up front: SQL decimal-point literals are DECIMAL in
    # both dialects, and a BIGINT/DECIMAL division would run the early
    # (pre-trig) steps in decimal arithmetic — DuckDB and Spark round
    # decimals differently, which measured ~4e-4 min of eq-of-time drift.
    # With a DOUBLE epoch every downstream step is IEEE double in both.
    ep = (
        f"(CAST(unix_micros(`{ts_col}`) AS DOUBLE) / 1000000.0"
        f" + {repr(float(shift_seconds))})"
    )
    out = df
    for name, tmpl in SOLPOS_STEPS:
        out = out.withColumn(name, F.expr(_fmt(tmpl, ep, latitude, longitude)))
    drop = [n for n, _ in SOLPOS_STEPS if n not in keep]
    return out.drop(*drop)


def solar_position_sql(
    source_sql: str,
    latitude: float,
    longitude: float,
    ts_col: str = "timestamp",
    shift_seconds: float = 0.0,
    keep: tuple[str, ...] = ("apparent_zenith", "azimuth"),
) -> str:
    """DuckDB mirror of :func:`solar_position`: wraps ``source_sql`` (a
    SELECT producing ``ts_col``) so the result adds exactly ``keep``.
    Evaluates the same ``SOLPOS_STEPS`` text as the Spark path."""
    # CAST AS DOUBLE: see solar_position — keeps both engines in IEEE
    # double from the first step instead of dialect-specific DECIMAL.
    ep = (
        f"(CAST(epoch_us({ts_col}) AS DOUBLE) / 1000000.0"
        f" + {repr(float(shift_seconds))})"
    )
    q = f"({source_sql})"
    for name, tmpl in SOLPOS_STEPS:
        q = f"(SELECT *, {_fmt(tmpl, ep, latitude, longitude)} AS {name} FROM {q})"
    drop = [n for n, _ in SOLPOS_STEPS if n not in keep]
    if not drop:
        return q
    cols = ", ".join(f'"{c}"' for c in drop)
    return f"(SELECT * EXCLUDE ({cols}) FROM {q})"


def poa_irradiance(
    df: DataFrame,
    latitude: float,
    longitude: float,
    tz: str = "America/Sao_Paulo",
    surface_tilt: float = 0.0,
    surface_azimuth: float = 0.0,
    period_seconds: float = 300.0,
    ts_col: str = "timestamp",
    engine: str = "builtin",
) -> DataFrame:
    """F7: isotropic POA irradiance per row
    (``lib/process_solcast_historic_data.py:20-71``). Requires columns
    ``dni, ghi, dhi, albedo``; returns ``df.* + poa``.

    ``engine="builtin"`` (default): NOAA position + isotropic transposition
    as codegen'd expressions. ``engine="pvlib"``: the reference's exact
    library via Arrow ``mapInPandas`` — cross-validation only; raises where
    pvlib is not installed. ``tz`` is accepted for signature parity with
    the reference (position math is tz-invariant on UTC instants)."""
    if engine == "builtin":
        pos = solar_position(
            df, latitude, longitude, ts_col=ts_col,
            shift_seconds=period_seconds / 2.0,
        )
        poa = POA_EXPR.format(
            dni="dni", ghi="ghi", dhi="dhi", albedo="albedo",
            tilt=repr(float(surface_tilt)), saz=repr(float(surface_azimuth)),
        )
        return pos.withColumn("poa", F.expr(poa)).drop(
            "apparent_zenith", "azimuth"
        )
    if engine != "pvlib":
        raise ValueError(f"unknown engine {engine!r}; use 'builtin' or 'pvlib'")
    if not HAVE_PVLIB:
        raise ImportError("engine='pvlib' requested but pvlib is not installed")

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


def poa_irradiance_sql(
    source_sql: str,
    latitude: float,
    longitude: float,
    surface_tilt: float = 0.0,
    surface_azimuth: float = 0.0,
    period_seconds: float = 300.0,
    ts_col: str = "timestamp",
) -> str:
    """DuckDB mirror of the builtin :func:`poa_irradiance` path: wraps a
    SELECT producing ``(ts_col, dni, ghi, dhi, albedo, ...)`` and yields
    the same columns plus ``poa``."""
    pos = solar_position_sql(
        source_sql, latitude, longitude, ts_col=ts_col,
        shift_seconds=period_seconds / 2.0,
    )
    poa = POA_EXPR.format(
        dni="dni", ghi="ghi", dhi="dhi", albedo="albedo",
        tilt=repr(float(surface_tilt)), saz=repr(float(surface_azimuth)),
    )
    return (
        f"(SELECT * EXCLUDE (apparent_zenith, azimuth), {poa} AS poa FROM {pos})"
    )
