"""End-to-end multimodal curation demo — the media path through the
engine, chained on one SparkSession. Every decode is REAL (the
stdlib codecs), every stage an Arrow-batched kernel whose blobs
never shuffle:

  1. attach media        (format-heterogeneous BINARY column:
                          PNG / JPEG / WebP blobs cycling by id)
  2. image features      (magic-byte dispatch -> stdlib decode ->
                          width/height/mean-luma)
  3. quality gate        (drop tiny images, the media analog of the
                          doc_quality length gate)
  4. resize              (2x2 integer box downsample, exact)
  5. audio + video pass  (WAV PCM feature extraction; MJPEG-AVI
                          frame sampling with per-frame JPEG decode)
  6. snapshot commit     (image features into the Iceberg-style
                          table layer, atomic pointer)

Run:  python examples/multimodal_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from georaster_spark.operators.multimodal import (  # noqa: E402
    decode_audio_features,
    decode_image_features,
    decode_video_features,
    downsample_image,
    with_avi_media,
    with_mixed_media,
    with_wav_media,
)
from georaster_spark.session import get_spark  # noqa: E402
from georaster_spark.sources import icetable  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("multimodal_pipeline", cores=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n0 = docs.count()

    # 1-2. attach the mixed-format media column, decode for real
    feats = decode_image_features(with_mixed_media(docs)).cache()
    kinds = {r["kind"]: r["n"] for r in feats.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    print(f"decoded kinds: {kinds}")

    # 3. quality gate: keep images with at least 12x12 actual pixels
    kept = feats.where((F.col("width") >= 12) & (F.col("height") >= 12))
    n_kept = kept.count()

    # 4. exact 2x2 box resize of the kept images
    resized = downsample_image(
        with_mixed_media(docs.join(kept.select("doc_id"), "doc_id"))
    )
    mean_small = resized.agg(F.avg("mean_luma")).collect()[0][0]

    # 5. audio + video lanes (WAV PCM, MJPEG AVI — real decodes)
    audio = decode_audio_features(with_wav_media(docs.limit(100)))
    video = decode_video_features(with_avi_media(docs.limit(100)), stride=2)
    total_ms = audio.agg(F.sum("duration_ms")).collect()[0][0]
    frames = video.agg(F.sum("n_sampled"), F.avg("mean_luma")).collect()[0]

    # 6. snapshot the image-feature table
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/media_features"
        icetable.write_table(kept, path, partition_by=["kind"])
        back = icetable.read_table(spark, path)
        assert back.count() == n_kept

    print(
        f"docs={n0} decoded={feats.count()} kept>=12px={n_kept} "
        f"resized_mean_luma={float(mean_small):.1f} "
        f"audio_total_ms={total_ms} video_frames_sampled={frames[0]} "
        f"video_mean_luma={float(frames[1]):.1f}"
    )
    print("MULTIMODAL_PIPELINE_OK")
    spark.stop()


if __name__ == "__main__":
    main()
