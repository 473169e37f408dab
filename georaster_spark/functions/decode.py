"""Value decoders and checked casts — Column algebra only (no UDFs).

Mirrors the reference's ``RasterValue`` conversions:

- Terrarium RGB→elevation: ``(r*256 + g + b/255) - 32768``
  (``src/lib.rs:126-128``); golden ``height(134,65,215) ==
  1601.843137254902`` (``src/lib.rs:202``).
- Mapbox RGB→elevation: ``(r*65536 + g*256 + b)/10 - 10000``
  (``src/lib.rs:130-132``); golden 1598.5294117647063 via the PMTiles
  test (``src/pmtiles.rs:121-133``).
- Checked numeric casts (``TryFrom<RasterValue>``,
  ``src/lib.rs:75-124``): NULL (NoData) never converts; a value
  outside the target family/range yields NULL in the ``try_`` form
  and raises in the strict form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def terrarium_height(r: Column, g: Column, b: Column) -> Column:
    """NULL in any channel (NoData) → NULL height (reference: NaN,
    ``src/lib.rs:154``; NULL is our NoData spelling)."""
    return (
        r.cast("double") * 256.0 + g.cast("double") + b.cast("double") / 255.0 - 32768.0
    )


def mapbox_height(r: Column, g: Column, b: Column) -> Column:
    return (
        (r.cast("double") * 65536.0 + g.cast("double") * 256.0 + b.cast("double")) / 10.0
        - 10000.0
    )


def height_from_rgba(rgba: Column, encoding: str = "terrarium") -> Column:
    """Height from an assembled ARRAY<INT> rgb(a) column."""
    r, g, b = rgba[0], rgba[1], rgba[2]
    if encoding == "terrarium":
        return terrarium_height(r, g, b)
    if encoding == "mapbox":
        return mapbox_height(r, g, b)
    raise ValueError(encoding)


# integer families that may convert to i64/u64 (reference allows only
# integral sources; float→int is a ValueRange-style failure,
# src/lib.rs:93-99 has no F32/F64 arm for i64)
_INT_DTYPES = {"u8", "u16", "u32", "u64", "i8", "i16", "i32", "i64"}
_FLOAT_DTYPES = {"f32", "f64"}


def try_cast_i64(value: Column, dtype: str) -> Column:
    """``i64::try_from(RasterValue)`` analog: integral families cast,
    float/other families are NULL (the try_ spelling of ValueRange).
    NULL input (NoData) stays NULL (``src/lib.rs:101``)."""
    if dtype in _INT_DTYPES:
        return value.cast("long")
    return F.lit(None).cast("long")


def try_cast_u64(value: Column, dtype: str) -> Column:
    """``u64::try_from`` analog: integral and non-negative, else NULL
    (``src/lib.rs:75-90``). U64 full range noted as DECIMAL territory
    (SURVEY.md §7 risk 3) — we carry DOUBLE-exact up to 2^53."""
    if dtype in _INT_DTYPES:
        return F.when(value >= 0, value.cast("long"))
    return F.lit(None).cast("long")


def try_cast_f64(value: Column, dtype: str) -> Column:
    """``f64::try_from`` analog: every numeric family converts
    (``src/lib.rs:104-124``); NoData (NULL) does not."""
    if dtype in _INT_DTYPES | _FLOAT_DTYPES:
        return value.cast("double")
    return F.lit(None).cast("double")


def cast_i64_strict(value: Column, dtype: str) -> Column:
    """Strict ``i64::try_from``: a float-family source RAISES at
    execution (the reference's ValueRange error, ``src/lib.rs:93-99``)
    instead of NULLing. NoData (NULL input) raises too — matching
    ``i64::try_from(NoData)`` being an error (``src/lib.rs:101``)."""
    if dtype not in _INT_DTYPES:
        return F.raise_error(F.lit(f"ValueRange: cannot convert {dtype} to i64"))
    return F.when(
        value.isNull(), F.raise_error(F.lit("ValueRange: NoData does not convert"))
    ).otherwise(value.cast("long"))


def cast_u64_strict(value: Column, dtype: str) -> Column:
    """Strict ``u64::try_from``: negative values and float/NoData
    sources raise (``src/lib.rs:75-90``)."""
    if dtype not in _INT_DTYPES:
        return F.raise_error(F.lit(f"ValueRange: cannot convert {dtype} to u64"))
    return F.when(
        value.isNull() | (value < 0),
        F.raise_error(F.lit("ValueRange: negative/NoData does not convert to u64")),
    ).otherwise(value.cast("long"))


def format_value(value: Column, rgba: Column | None = None) -> Column:
    """``Display for RasterValue`` analog (``src/lib.rs:53-73``):
    scalar → digits, RGB → ``(r,g,b)``, NULL → ``<NoData>``."""
    scalar = F.when(value.isNull(), F.lit("<NoData>")).otherwise(value.cast("string"))
    if rgba is None:
        return scalar
    return F.when(
        rgba.isNotNull(),
        F.concat(F.lit("("), F.array_join(rgba, ","), F.lit(")")),
    ).otherwise(scalar)


def nullify_nodata(pixels: DataFrame, nodata: float | None) -> DataFrame:
    """Map a sentinel nodata value to NULL (e.g. the DTM's nodata=0,
    ``data/Makefile:13``)."""
    if nodata is None:
        return pixels
    return pixels.withColumn(
        "value",
        F.when(F.col("value") == F.lit(nodata), F.lit(None)).otherwise(F.col("value")),
    )
