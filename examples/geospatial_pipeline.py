"""End-to-end geospatial pipeline demo — the raster+vector path
through the engine on one SparkSession:

  1. geocode + cell-encode   (Arrow-vectorized, no per-row Python)
  2. point-in-polygon join   (broadcast cover index -> ray-cast)
  3. rasterize               (doc density onto the 64x64 grid)
  4. DTM terrain analysis    (3x3 focal stats + Horn hillshade over
                              the tile-halo stencil; D8 flow
                              direction + k-step accumulation)
  5. downsample              (bilinear 200x200 -> 64x64)
  6. snapshot commit         (density grid through the table layer)

Run:  python examples/geospatial_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from georaster_spark import queries as Q  # noqa: E402
from georaster_spark.datagen import polygons  # noqa: E402
from georaster_spark.grid import RasterGeometry  # noqa: E402
from georaster_spark.operators import raster as R  # noqa: E402
from georaster_spark.operators.spatial_join import pip_join  # noqa: E402
from georaster_spark.queries import GRID64, docs_geocoded  # noqa: E402
from georaster_spark.session import get_spark  # noqa: E402
from georaster_spark.sources import icetable  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("geospatial_pipeline", cores=8, shuffle_partitions=8)

    # 1+2: geocode, cell-encode, and the two-stage polygon join
    docs = docs_geocoded(spark, sf_dir)
    joined = pip_join(docs, polygons(), res=11)
    per_poly = joined.groupBy("poly_id").agg(F.count(F.lit(1)).alias("n_docs"))
    print("docs per polygon:", {r.poly_id: r.n_docs for r in per_poly.collect()})

    # 3: rasterize document density onto the demo grid
    g = RasterGeometry(
        width=64, height=64, tile_w=64, tile_h=64,
        origin_x=GRID64["origin_x"], origin_y=GRID64["origin_y"],
        px_sz_x=GRID64["px"], px_sz_y=-GRID64["px"],
    )
    density = R.rasterize(docs, g, F.col("lon"), F.col("lat"), F.col("doc_id"), agg="count")
    print("non-empty density cells:", density.count())

    # 4: terrain analysis over the DTM crop — focal stats + hillshade
    crop = Q._dtm_crop(spark)
    focal = R.focal_stats_halo(crop, tile=64)
    rough = focal.select(
        F.avg(F.col("max_v") - F.col("min_v")).alias("mean_local_relief")
    ).collect()[0][0]
    grads = R.horn_gradients_halo(crop, tile=64)
    slopes = grads.select(
        F.avg(F.abs(F.col("gx_num")) / 80.0).alias("mean_dzdx"),
        F.avg(F.abs(F.col("gy_num")) / 80.0).alias("mean_dzdy"),
    ).collect()[0]
    print(
        f"mean local relief {rough:.1f} m, mean |dz/dx| {slopes.mean_dzdx:.1f}, "
        f"mean |dz/dy| {slopes.mean_dzdy:.1f} (synthetic DTM is rough by design)"
    )

    # 4b: hydrology — D8 flow direction, then the k-step contributing
    # count over the resulting out-degree-1 flow graph
    flow = R.d8_flow_halo(crop, tile=64)
    acc = R.d8_accumulation_k(flow, k=4)
    sinks = flow.where(F.col("d8") == 0).count()
    top = acc.orderBy(F.col("acc4").desc(), "x", "y").first()
    print(
        f"flow cells {flow.count()} ({sinks} sinks); busiest cell "
        f"({top.x},{top.y}) gathers {top.acc4} cells within 4 steps"
    )

    # 5: bilinear downsample of the crop to the demo grid size
    small = R.resample_bilinear(crop, Q.FOCAL_X0, Q.FOCAL_Y0, Q.FOCAL_W, Q.FOCAL_W, 64, 64)
    print("downsampled pixels:", small.count())

    # 6: commit the density grid through the snapshot layer
    out = tempfile.mkdtemp(prefix="density_grid_")
    icetable.write_table(density.select("x", "y", "value"), out)
    m = icetable.read_manifest(out)
    print(f"committed snapshot {m['snapshot_id']} at {out} ({len(m['files'])} files)")


if __name__ == "__main__":
    main()
