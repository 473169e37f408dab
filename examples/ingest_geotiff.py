"""Real GeoTIFF ingestion demo — point the engine at actual .tif
files (the reference's own test fixtures), inspect them, decode
pixels distributed, run a zonal-style aggregate, and write a derived
raster back out with the engine's TIFF sink.

    python examples/ingest_geotiff.py [tiff_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from georaster_spark import get_spark  # noqa: E402
from georaster_spark.sources.geotiff import (  # noqa: E402
    epsg_code,
    open_tiff,
    pixels_df,
    read_pixel,
    write_tiff,
)
from georaster_spark.sources.raster_catalog import (  # noqa: E402
    entries_from_files,
    raster_meta_df,
)


def main() -> None:
    tiff_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data/tiff"
    paths = [f"{tiff_dir}/{n}" for n in ("byte.tif", "small_world.tif", "sat.tif")]
    spark = get_spark("ingest_demo", cores=8, shuffle_partitions=8)

    # 1. inspect: headers -> catalog rows (the `info` workload)
    raster_meta_df(spark, entries_from_files(paths)).show(truncate=False)
    for p in paths:
        tf = open_tiff(p)
        print(f"{p}: EPSG {epsg_code(tf)}, geo_params {tf.geo_params!r}")

    # 2. single-pixel access (the `pixel` workload, local API)
    print("byte.tif (0,0) =", read_pixel(open_tiff(paths[0]), 0, 0))

    # 3. distributed decode + per-raster/per-band statistics
    px = pixels_df(spark, paths)
    px.groupBy("raster_id", "band").agg(
        F.count(F.lit(1)).alias("n_px"),
        F.round(F.avg("value"), 2).alias("mean"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
    ).orderBy("raster_id", "band").show()

    # 4. derive + sink: byte.tif thresholded to a mask, written back
    rows = (
        px.where(F.col("raster_id") == "byte")
        .select("x", "y", (F.col("value") > 107).cast("int").alias("v"))
        .collect()
    )
    mask = np.zeros((20, 20), dtype=np.uint8)
    for r in rows:
        mask[r.y, r.x] = r.v
    out = "/tmp/byte_mask.tif"
    write_tiff(out, mask, "u8", pixel_scale=(60.0, -60.0), origin=(440720.0, 3751320.0))
    back = open_tiff(out)
    print(f"wrote {out}: {back.images[0].width}x{back.images[0].height},",
          f"origin {back.origin()}, mask(0,0) = {read_pixel(back, 0, 0)}")


if __name__ == "__main__":
    main()
