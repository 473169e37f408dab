"""Grid math golden tests — re-expressions of the reference's
geotransform and tiling assertions (tests/geotiff.rs, see each test).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from georaster_spark.datagen import fixture_strips1x9, fixture_world400, fixture_sat200
from georaster_spark.grid import RasterGeometry


WORLD400 = fixture_world400()[0]


class TestGeotransform:
    def test_world_to_pixel_golden(self):
        """tests/geotiff.rs:504-524 (small_world.tif round trips)."""
        g = WORLD400
        assert g.world_to_pixel(0.0, 0.0) == (200, 100)
        assert g.pixel_to_world(200, 100) == (0.0, 0.0)
        assert g.world_to_pixel(-90.0, 45.0) == (100, 50)
        assert g.pixel_to_world(100, 50) == (-90.0, 45.0)

    def test_column_exprs_match_scalar(self, spark):
        """Round-trip property over the whole grid (Column form)."""
        g = WORLD400
        df = spark.range(0, 400 * 200).select(
            (F.col("id") % 400).cast("int").alias("px"),
            (F.col("id") / 400).cast("int").alias("py"),
        )
        wx, wy = g.pixel_to_world_cols(F.col("px"), F.col("py"))
        df = df.withColumn("wx", wx).withColumn("wy", wy)
        rx, ry = g.world_to_pixel_cols(F.col("wx"), F.col("wy"))
        bad = df.where((rx != F.col("px")) | (ry != F.col("py"))).count()
        assert bad == 0

    def test_column_golden_points(self, spark):
        g = WORLD400
        df = spark.createDataFrame([(0.0, 0.0), (-90.0, 45.0)], "wx double, wy double")
        px, py = g.world_to_pixel_cols(F.col("wx"), F.col("wy"))
        rows = df.select(px.alias("px"), py.alias("py")).collect()
        assert [(r.px, r.py) for r in rows] == [(200, 100), (100, 50)]


class TestTileMath:
    def test_padding(self):
        """Padding only on last col/row (src/geotiff.rs:469-486)."""
        g = fixture_sat200()[0]  # 200x200, tile 512 -> single padded tile
        assert g.tiles_across == 1 and g.tiles_down == 1
        assert g.get_padding(0) == (312, 312)

        s = fixture_strips1x9()[0]  # 1x9, strip 5 -> short last strip
        assert s.tiles_down == 2
        assert s.get_padding(0) == (0, 0)
        assert s.get_padding(1) == (0, 1)

    def test_tile_index_chunky(self):
        g = RasterGeometry(width=100, height=50, tile_w=32, tile_h=16)
        assert g.tiles_across == 4 and g.tiles_down == 4
        assert g.tile_index(0, 0) == 0
        assert g.tile_index(33, 0) == 1
        assert g.tile_index(0, 16) == 4
        assert g.tile_index(99, 49) == 15

    def test_tile_index_planar_floor_quirk(self):
        """Planar band offset uses FLOOR(height/tile_h) — the
        reference quirk at src/geotiff.rs:495-498."""
        g = RasterGeometry(width=10, height=9, tile_w=10, tile_h=5, bands=2, planar=True)
        # floor(9/5) = 1 (NOT tiles_down=2)
        assert g.tile_index(0, 0, band=1) == 1
        assert g.tile_index(0, 5, band=0) == 1  # collides — quirk preserved

    def test_tile_offset_padded_stride(self):
        """The 0.2.0 padded-offset bugfix (src/geotiff.rs:506-516,
        CHANGELOG.md:15): right padding shrinks the row stride."""
        g = fixture_sat200()[0]
        # stride = 512-312 = 200, spp = 3
        assert g.tile_offset(0, 0, 0) == 0
        assert g.tile_offset(0, 1, 0) == 3
        assert g.tile_offset(0, 0, 1) == 200 * 3
        assert g.tile_offset(0, 199, 199) == (199 * 200 + 199) * 3

    def test_column_tile_exprs_match_scalar(self, spark):
        g = RasterGeometry(width=100, height=50, tile_w=32, tile_h=16)
        df = spark.range(0, 100 * 50).select(
            (F.col("id") % 100).cast("int").alias("x"),
            (F.col("id") / 100).cast("int").alias("y"),
        )
        idx = g.tile_index_cols(F.col("x"), F.col("y"))
        off = g.tile_offset_cols(F.col("x"), F.col("y"))
        rows = df.select("x", "y", idx.alias("i"), off.alias("o")).collect()
        for r in rows:
            assert r.i == g.tile_index(r.x, r.y), (r.x, r.y)
            assert r.o == g.tile_offset(g.tile_index(r.x, r.y), r.x, r.y), (r.x, r.y)
