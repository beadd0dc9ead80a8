"""Deployment-shaped flagship: scan a STORED images table instead of
synthesizing inline (BASELINE.json input_hint: "Iceberg table ... SF-scaled
sample"). Parity contract: identical output to the inline flagship."""

import pandas as pd

from versatiles_rs_spark import fixtures
from versatiles_rs_spark.pipeline import flagship, flagship_scan


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_flagship_scan_matches_inline(spark, tmp_path):
    n = 2000
    path = str(tmp_path / "images")
    fixtures.images_df(spark, n, partitions=8).write.parquet(path)

    inline = _sorted_pdf(flagship(spark, n_images=n, partitions=8, n_polygons=50))
    for mode in ("python", "jvm"):
        scan = _sorted_pdf(flagship_scan(spark, path, n_polygons=50, scan_mode=mode))
        assert list(inline.columns) == list(scan.columns)
        pd.testing.assert_frame_equal(inline, scan)


def test_tiles_from_images_matches_fused_generator(spark, tmp_path):
    """The scan-side kernel must emit exactly what the fused synth stage
    emits (same coords, hilbert ids, and re-encoded payload bytes)."""
    n = 300
    path = str(tmp_path / "images")
    fixtures.images_df(spark, n, partitions=4).write.parquet(path)

    synth = fixtures.images_with_tiles_df(
        spark, n, partitions=4, skew=True, target_fmt="jpg", emit_bytes=True
    )
    scan = fixtures.tiles_from_images_df(
        spark.read.parquet(path), skew=True, target_fmt="jpg", emit_bytes=True
    )
    a = _sorted_pdf(synth.selectExpr("image_id", "z", "x", "y", "hilbert",
                                     "sha2(hex(bytes), 256) as payload_sha"))
    b = _sorted_pdf(scan.selectExpr("image_id", "z", "x", "y", "hilbert",
                                    "sha2(hex(bytes), 256) as payload_sha"))
    pd.testing.assert_frame_equal(a, b)


def test_materialize_images_reuses_cache(spark, tmp_path):
    root = str(tmp_path / "cache")
    p1 = fixtures.materialize_images(spark, 100, partitions=4, cache_root=root)
    import os

    mtime = os.path.getmtime(os.path.join(p1, "_SUCCESS"))
    p2 = fixtures.materialize_images(spark, 100, partitions=4, cache_root=root)
    assert p1 == p2
    assert os.path.getmtime(os.path.join(p2, "_SUCCESS")) == mtime
