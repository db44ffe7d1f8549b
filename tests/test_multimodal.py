"""Real PPM decode: parser robustness + end-to-end pixel stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blinkit_etl_pipeline_spark.operators import multimodal

from conftest import SF_SMOKE

RASTER = bytes(range(24))  # 4x2 RGB


def test_decode_ppm_header_variants():
    for header in (
        b"P6\n4 2\n255\n",
        b"P6 # trailing comment\n# full-line comment\n 4  2 \n255\n",
        b"P6\t4\n2\r255\n",
    ):
        w, h, raster = multimodal.decode_ppm(header + RASTER)
        assert (w, h, raster) == (4, 2, RASTER)


def test_decode_ppm_rejects_bad_payloads():
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P5\n4 2\n255\n" + RASTER)  # wrong magic
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P6\n4 2\n65535\n" + RASTER)  # 16-bit maxval
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P6\n4 2\n255\n" + RASTER[:-1])  # truncated
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG....")  # non-PPM needs PIL


def test_synthesized_ppm_roundtrips_through_decoder(spark):
    """The JVM-side PPM builder and the Python decoder must agree on
    every byte: parsed dims == metadata dims, means == formula."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(60)
    media = multimodal.synthesize_media(docs)
    rows = (
        multimodal.media_features(media)
        .filter(F.col("media_type") == "image")
        .collect()
    )
    assert rows
    for r in rows:
        assert r["parsed_width"] == r["width"]
        assert r["parsed_height"] == r["height"]
        mid, w, h = r["media_id"], r["width"], r["height"]
        npx = w * h
        for ch, col in enumerate(("mean_r", "mean_g", "mean_b")):
            expect = (
                sum(
                    (mid * multimodal.PIX_A + (p * 3 + ch) * multimodal.PIX_B) % 256
                    for p in range(npx)
                )
                / npx
            )
            assert abs(r[col] - expect) < 1e-6, (mid, col)
