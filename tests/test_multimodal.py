"""Multimodal operator tests: binary media plumbing (schema, batch
shape, determinism) with the stubbed decode."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from georaster_spark.operators.multimodal import (
    audio_meta,
    decode_image_features,
    frame_sample,
    resize_image,
    with_media,
)


@pytest.fixture(scope="module")
def media_docs(spark):
    rows = [(i, f"doc {i} body " + "x" * (i * 7 % 50)) for i in range(40)]
    return with_media(spark.createDataFrame(rows, "doc_id long, text string"))


def test_media_is_binary_and_deterministic(media_docs):
    f = media_docs.schema["media"]
    assert f.dataType.typeName() == "binary"
    a = media_docs.select("doc_id", "media").orderBy("doc_id").collect()
    b = media_docs.select("doc_id", "media").orderBy("doc_id").collect()
    assert a == b
    assert bytes(a[0]["media"]).startswith(b"IMG0")


def test_decode_image_features_matches_local_stub(media_docs):
    out = {r["doc_id"]: r for r in decode_image_features(media_docs).collect()}
    rows = media_docs.select("doc_id", "media").collect()
    assert len(out) == len(rows)
    for r in rows:
        b = bytes(r["media"])
        h = hashlib.md5(b).hexdigest()
        got = out[r["doc_id"]]
        assert got["n_bytes"] == len(b)
        assert got["width"] == 1 + int(h[0:4], 16) % 1024
        assert got["height"] == 1 + int(h[4:8], 16) % 1024
        assert got["mean_luma"] == int(h[8:10], 16)
        assert got["digest"] == h
        assert 1 <= got["width"] <= 1024 and 1 <= got["height"] <= 1024


def test_frame_sample_covers_every_stride_frame(media_docs):
    fb, st = 8, 2
    out = frame_sample(media_docs, frame_bytes=fb, stride=st).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for r in media_docs.select("doc_id", "media").collect():
        b = bytes(r["media"])
        n_frames = (len(b) + fb - 1) // fb
        expect = list(range(0, n_frames, st))
        got = sorted(x["frame_idx"] for x in by_doc[r["doc_id"]])
        assert got == expect
        for x in by_doc[r["doc_id"]]:
            chunk = b[x["frame_idx"] * fb : (x["frame_idx"] + 1) * fb]
            assert x["frame_digest"] == hashlib.md5(chunk).hexdigest()
            assert x["frame_len"] == len(chunk)


def test_audio_meta_is_column_algebra(media_docs):
    # no Python stage: the plan must stay whole-stage-codegen-able
    plan = audio_meta(media_docs)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    r = audio_meta(media_docs).where(F.col("doc_id") == 1).collect()[0]
    n = len(b"IMG0doc 1 body " + b"x" * 7)
    assert r["n_bytes"] == n
    assert r["n_samples"] == n // 2
    assert r["duration_ms"] == (n // 2) * 1000 // 16000


def test_resize_is_deterministic_and_geometry_correct(media_docs):
    out = resize_image(media_docs, 224, 224).collect()
    assert all(r["width"] == 224 and r["height"] == 224 for r in out)
    digests = {r["doc_id"]: r["digest"] for r in out}
    again = {r["doc_id"]: r["digest"] for r in resize_image(media_docs, 224, 224).collect()}
    assert digests == again
    assert len(set(digests.values())) == len(digests)  # distinct inputs → distinct outputs


def test_decode_bytes_png_is_a_real_decode():
    """Hand-checked: 3x2 greyscale [[10,20,30],[40,50,60]] → width 3,
    height 2, mean 210 // 6 = 35 — decoded from actual PNG bytes."""
    import numpy as np

    from georaster_spark.operators.multimodal import _decode_bytes
    from georaster_spark.sources.png import encode_png

    png = encode_png(np.array([[10, 20, 30], [40, 50, 60]], np.uint8))
    assert _decode_bytes(png) == (3, 2, 35)


def test_decode_image_features_mixes_real_and_fake(spark):
    """PNG rows decode for real; non-PNG rows keep the disclosed
    digest fake — in the same kernel pass."""
    import hashlib

    import numpy as np

    from georaster_spark.operators.multimodal import decode_image_features
    from georaster_spark.sources.png import encode_png

    png = encode_png(np.full((4, 7), 9, np.uint8))
    fake = b"IMG0hello"
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(fake))], "doc_id long, media binary"
    )
    rows = {r["doc_id"]: r for r in decode_image_features(df).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["mean_luma"]) == (7, 4, 9)
    assert rows[1]["digest"] == hashlib.md5(png).hexdigest()
    h = hashlib.md5(fake).hexdigest()
    assert rows[2]["width"] == int(h[0:4], 16) % 1024 + 1
    assert rows[2]["mean_luma"] == int(h[8:10], 16)


def test_with_png_media_formula_roundtrip(spark):
    """Generated PNG geometry matches the shared formula for a
    hand-picked id: doc_id=25 → w = 25 % 24 + 8 = 9, h = 175 % 16 + 8
    = 23; pixel (2,3) = (2*5 + 3*11 + 25) % 256 = 68."""
    from georaster_spark.operators.multimodal import with_png_media
    from georaster_spark.sources.png import decode_png

    df = with_png_media(spark.createDataFrame([(25,)], "doc_id long"))
    blob = bytes(df.collect()[0]["media"])
    arr = decode_png(blob)
    assert arr.shape == (23, 9)
    assert arr[3, 2] == 68
