"""Raster workflow demo — the reference's example programs
(info / pixel / crop / img2ascii / geotiff_dtm) replayed on the
engine's DataFrame operators over synthetic fixtures.

    python examples/raster_demo.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from georaster_spark import get_spark  # noqa: E402
from georaster_spark.datagen import (  # noqa: E402
    DTM_GEOM,
    array_to_tiles_df,
    dtm_pixels_df,
    fixture_world400,
)
from georaster_spark.operators import raster as R  # noqa: E402
from georaster_spark.sources.raster_catalog import fixture_entries, raster_meta_df  # noqa: E402


def main() -> None:
    spark = get_spark("raster_demo")

    # info: the raster catalog (one row per image/overview level)
    raster_meta_df(spark, fixture_entries()).show(truncate=False)

    # pixel + window max: the geotiff_dtm goldens (636 / 2161)
    px = dtm_pixels_df(spark)
    px.where((F.col("x") == 0) & (F.col("y") == 0)).select("value").show()
    print(
        "window max:",
        px.where(DTM_GEOM.window_filter(F.col("x"), F.col("y"), 2500, 3000, 100, 100))
        .agg(F.max("value"))
        .collect()[0][0],
    )

    # crop: clip + rebase, then re-tile as a new raster
    cropped = R.crop(px, 2500, 3000, 100, 100)
    print("cropped rows:", cropped.count())

    # img2ascii: world map fixture through the tile-decode path
    geom, arr = fixture_world400()
    tiles = array_to_tiles_df(spark, "world400", geom, arr)
    rgb = R.assemble_rgb(R.tiles_to_pixels(tiles, geom))
    chars = rgb.select(
        "x", "y",
        R.rgb_to_ascii_cols(F.col("rgba")[0], F.col("rgba")[1], F.col("rgba")[2]).alias("ch"),
    )
    lines = R.ascii_lines(chars).orderBy("y").collect()
    for row in lines[::8]:  # every 8th line keeps it terminal-sized
        print(row["line"][::2])


if __name__ == "__main__":
    main()
