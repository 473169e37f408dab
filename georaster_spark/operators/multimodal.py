"""Multimodal (image/audio/video) column operators.

Media is carried as an opaque ``BINARY`` column plus typed metadata —
the model the reference applies to raster tile bytes
(``/root/reference/src/pmtiles.rs:21-34``: an XYZ tile is compressed
bytes until a decoder turns it into pixels). Here the same pattern
serves a webtext training pipeline: decode / feature-extract /
resize / frame-sample implemented as Arrow-batched ``mapInPandas``
kernels so the Spark-side plumbing (schema, partitioning, batch
shape) is real and tested at scale.

The actual codec step is STUBBED: this container has no image/audio
libraries, so ``_decode_bytes`` falls back to a deterministic fake
derived from the media digest (clearly marked below). Swapping in
PIL/torchaudio changes ONE function; every plan stays identical.

Scale notes:
- media bytes never pass through a shuffle — all kernels are narrow
  (mapInPandas over the scan partitioning); aggregations happen on
  the small typed-metadata output, never on the blobs;
- column pruning matters: callers must select the media column only
  in decode stages (Parquet never reads it otherwise);
- per-batch memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low
  (e.g. 64) for multi-MB media blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoder if ever available in the image
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:  # pragma: no cover - container has no PIL
    _HAVE_PIL = False


def with_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Attach a deterministic synthetic ``media BINARY`` column (a
    fake image blob: 4-byte magic + utf-8 payload). Pure Column
    exprs — reproducible in the DuckDB oracle as
    ``encode('IMG0' || text)``."""
    return docs.withColumn(
        "media", F.encode(F.concat(F.lit("IMG0"), F.col(text_col)), "UTF-8")
    )


def _digest_features(digest: "pd.Series") -> dict[str, "pd.Series"]:
    """THE deterministic fake-decode formula, in one place (pandas
    vectorized): (width, height, mean_luma) derived from the md5
    digest so tests and the DuckDB oracle can reproduce it exactly.
    Both the batch kernel and the single-item API route through
    this."""
    return {
        "width": digest.str.slice(0, 4).apply(int, base=16) % 1024 + 1,
        "height": digest.str.slice(4, 8).apply(int, base=16) % 1024 + 1,
        "mean_luma": digest.str.slice(8, 10).apply(int, base=16),
    }


def _decode_bytes(media: bytes) -> tuple[int, int, int]:
    """Decode media bytes → (width, height, mean_luma).

    STUB: real implementation would be ``Image.open(BytesIO(media))``
    (PIL absent in this container); swapping a real codec in means
    replacing this function AND the digest branch in
    ``decode_image_features``'s kernel (both guarded by _HAVE_PIL so
    a wired codec can't silently coexist with the fake).
    """
    if _HAVE_PIL:  # pragma: no cover - not reachable in this container
        raise NotImplementedError("real PIL decode path not wired in this build")
    h = hashlib.md5(media).hexdigest()
    f = _digest_features(pd.Series([h]))
    return int(f["width"][0]), int(f["height"][0]), int(f["mean_luma"][0])


def decode_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_bytes, width, height, mean_luma, digest) via an
    Arrow-batched ``mapInPandas`` kernel — the heavy media column is
    consumed inside the partition and never shuffled."""
    schema = (
        f"{id_col} long, n_bytes long, width long, height long, "
        "mean_luma long, digest string"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _HAVE_PIL:  # pragma: no cover - same guard as _decode_bytes
            raise NotImplementedError("real PIL decode path not wired in this build")
        for pdf in batches:
            # the digest itself is per-item (as a real codec would
            # be), but everything derived from it is pandas-vectorized
            # — one md5 per blob, no per-row tuple assembly; the
            # feature formula lives in _digest_features (one place)
            blobs = pdf["media"].map(bytes)
            digest = blobs.map(lambda b: hashlib.md5(b).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_bytes": blobs.str.len().astype("int64"),
                    **_digest_features(digest),
                    "digest": digest,
                }
            )

    return df.select(id_col, "media").mapInPandas(kernel, schema=schema)


def resize_image(df: DataFrame, out_w: int, out_h: int, id_col: str = "doc_id") -> DataFrame:
    """Resize stub: emits the output geometry + a deterministic digest
    of what the resized bytes would hash to (md5(digest ++ "WxH")).
    Real path = PIL ``resize`` inside the same kernel."""
    feats = decode_image_features(df, id_col)
    return feats.select(
        id_col,
        F.lit(out_w).cast("long").alias("width"),
        F.lit(out_h).cast("long").alias("height"),
        F.md5(F.concat_ws("x", "digest", F.lit(out_w), F.lit(out_h))).alias("digest"),
    )


def frame_sample(
    df: DataFrame,
    frame_bytes: int = 16,
    stride: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """"Video" frame sampling: slice the blob into fixed-size frames,
    keep every ``stride``-th, emit (id, frame_idx, frame_digest,
    frame_len). One row-amplifying narrow stage — the blowup happens
    AFTER column pruning, and only digests leave the kernel."""
    schema = f"{id_col} long, frame_idx long, frame_digest string, frame_len long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, media in zip(pdf[id_col], pdf["media"]):
                b = bytes(media)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, stride):
                    chunk = b[fi * frame_bytes : (fi + 1) * frame_bytes]
                    rows.append((i, fi, hashlib.md5(chunk).hexdigest(), len(chunk)))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "frame_digest", "frame_len"]
            )

    return df.select(id_col, "media").mapInPandas(kernel, schema=schema)


def audio_meta(
    df: DataFrame,
    sample_rate: int = 16000,
    bytes_per_sample: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """"Audio" metadata from blob length: sample count + duration.
    Pure Column algebra (JVM-side) — no kernel needed for metadata
    that doesn't require decoding."""
    n_bytes = F.length("media").cast("long")
    samples = F.floor(n_bytes / bytes_per_sample).cast("long")
    return df.select(
        id_col,
        n_bytes.alias("n_bytes"),
        samples.alias("n_samples"),
        F.floor(samples * 1000 / sample_rate).cast("long").alias("duration_ms"),
    )
