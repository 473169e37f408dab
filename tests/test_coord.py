"""R27 external coordinate interop (reference src/geo.rs:19-140).

Hand-checked SEMANTICS tests (not just the oracle): the reference's
own doctest/unit values are pushed through the Column converters.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from georaster_spark.functions import geo as G

# the reference doctest values (src/geo.rs:11-16 and :29-36)
LAT, LON = 50.013, 160.423


def _one(spark, col):
    return spark.range(1).select(col.alias("c")).collect()[0]["c"]


def test_coord_new_is_lat_first(spark):
    """Coordinate::new(latitude, longitude) -> {x: lon, y: lat}
    (geo.rs:38-43): new(50.013, 160.423).x == 160.423."""
    c = _one(spark, G.coord_new(F.lit(LAT), F.lit(LON)))
    assert c["x"] == LON and c["y"] == LAT


def test_constructor_equals_struct_literal(spark):
    """The doctest identity (geo.rs:11-16): Coordinate::new(lat, lon)
    == Coordinate { x: lon, y: lat }."""
    row = spark.range(1).select(
        G.coord_new(F.lit(LAT), F.lit(LON)).alias("c1"),
        G.coord_from_xy(F.lit(LON), F.lit(LAT)).alias("c2"),
    ).collect()[0]
    assert row["c1"] == row["c2"]


def test_tuple_and_array_are_x_first(spark):
    """From<(f64, f64)> and From<[f64; 2]> take (x, y) order
    (geo.rs:46-61) — the deliberate asymmetry vs the lat-first
    constructor."""
    c = _one(spark, G.coord_from_xy(F.lit(1.25), F.lit(6.5)))
    assert c["x"] == 1.25 and c["y"] == 6.5
    c = _one(spark, G.coord_from_array(F.array(F.lit(1.25), F.lit(6.5))))
    assert c["x"] == 1.25 and c["y"] == 6.5


def test_geo_coord_round_trip(spark):
    """geo-crate Coord round trip (geo.rs:84-99): struct -> [x, y]
    array -> struct preserves both fields, using the reference's own
    geo_conversion test values (1.2345, 6.7890)."""
    c0 = G.coord_from_xy(F.lit(1.2345), F.lit(6.7890))
    c1 = G.coord_from_array(G.coord_to_array(c0))
    row = spark.range(1).select(c0.alias("a"), c1.alias("b")).collect()[0]
    assert row["a"] == row["b"]
    arr = _one(spark, G.coord_to_array(c0))
    assert arr == [1.2345, 6.7890]


def test_wkt_and_geojson_text_round_trip(spark):
    """Text interop: e6-canonical WKT/GeoJSON build -> parse returns
    the exact e6 integers, including negative coordinates and
    fraction zero-padding."""
    for x, y in [(160.423, 50.013), (-0.05, -12.0), (7.059309, 47.133037)]:
        xe, ye = round(x * 1e6), round(y * 1e6)
        row = spark.range(1).select(
            G.wkt_point_e6(F.lit(xe), F.lit(ye)).alias("wkt"),
            G.geojson_point_e6(F.lit(xe), F.lit(ye)).alias("gj"),
            G.parse_point_e6(
                G.wkt_point_e6(F.lit(xe), F.lit(ye)), G.WKT_POINT_RE, 1
            ).alias("wx"),
            G.parse_point_e6(
                G.wkt_point_e6(F.lit(xe), F.lit(ye)), G.WKT_POINT_RE, 2
            ).alias("wy"),
            G.parse_point_e6(
                G.geojson_point_e6(F.lit(xe), F.lit(ye)), G.GEOJSON_POINT_RE, 1
            ).alias("gx"),
            G.parse_point_e6(
                G.geojson_point_e6(F.lit(xe), F.lit(ye)), G.GEOJSON_POINT_RE, 2
            ).alias("gy"),
        ).collect()[0]
        assert (row["wx"], row["wy"]) == (xe, ye), row["wkt"]
        assert (row["gx"], row["gy"]) == (xe, ye), row["gj"]


def test_wkt_text_bytes(spark):
    """The canonical text itself (what an external consumer reads)."""
    wkt = _one(spark, G.wkt_point_e6(F.lit(-50000), F.lit(12000000)))
    assert wkt == "POINT(-0.050000 12.000000)"
    gj = _one(spark, G.geojson_point_e6(F.lit(1234567), F.lit(-7000001)))
    assert gj == '{"type":"Point","coordinates":[1.234567,-7.000001]}'


def test_coord_interop_is_single_codegen_stage(spark):
    """Plan shape: the whole interop chain is ONE WholeStageCodegen
    projection over the scan — zero Exchanges (it would be a pure
    map at 100 TB)."""
    from georaster_spark.queries import q_coord_interop

    plan = q_coord_interop(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
