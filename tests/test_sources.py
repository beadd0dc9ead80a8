"""Container sources: directory-tree round-trip, pruned tile-table scans,
TileJSON metadata."""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark import fixtures
from versatiles_rs_spark.codecs import decode_image
from versatiles_rs_spark.sinks.writers import export_directory_tree
from versatiles_rs_spark.sources.containers import (
    read_directory_tree,
    read_tile_table,
    tilejson_for,
)


@pytest.fixture(scope="module")
def tiles(spark):
    df = fixtures.images_with_tiles_df(spark, 300, size=16, zoom=4, partitions=4, skew=False)
    return (
        df.groupBy("z", "x", "y")
        .agg(F.min("bytes").alias("bytes"))
        .withColumn("fmt", F.lit("png"))
    )


def test_directory_roundtrip(spark, tiles, tmp_path):
    root = str(tmp_path / "tree")
    export_directory_tree(tiles, root)
    back = read_directory_tree(spark, root)
    assert back.count() == tiles.count()
    # coordinate parity and payload byte-equality
    a = {(r.z, r.x, r.y): bytes(r.bytes) for r in tiles.collect()}
    b = {(r.z, r.x, r.y): bytes(r.bytes) for r in back.collect()}
    assert a == b
    assert back.select("fmt").distinct().collect()[0].fmt == "png"


def test_directory_gzip_payloads(spark, tmp_path):
    # hand-write a tree with a gzipped tile: {z}/{x}/{y}.png.gz
    d = tmp_path / "gz" / "3" / "1"
    os.makedirs(d)
    from versatiles_rs_spark.codecs import encode_png
    from versatiles_rs_spark.fixtures import make_pixels

    raw = encode_png(make_pixels(5, 16))
    (d / "2.png.gz").write_bytes(gzip.compress(raw))
    (d / "3.png").write_bytes(raw)
    back = read_directory_tree(spark, str(tmp_path / "gz"))
    rows = {(r.z, r.x, r.y): r for r in back.collect()}
    assert set(rows) == {(3, 1, 2), (3, 1, 3)}
    assert bytes(rows[(3, 1, 2)].bytes) == raw  # transparently gunzipped
    assert rows[(3, 1, 2)].codec == "none" and rows[(3, 1, 2)].fmt == "png"
    assert decode_image(bytes(rows[(3, 1, 2)].bytes)).shape == (16, 16, 3)


def test_non_tile_files_skipped(spark, tmp_path):
    d = tmp_path / "mixed" / "2" / "0"
    os.makedirs(d)
    from versatiles_rs_spark.codecs import encode_png
    from versatiles_rs_spark.fixtures import make_pixels

    (d / "1.png").write_bytes(encode_png(make_pixels(1, 16)))
    (tmp_path / "mixed" / "metadata.json").write_text("{}")
    back = read_directory_tree(spark, str(tmp_path / "mixed"))
    assert back.count() == 1


def test_tile_table_scan_pruning(spark, tiles, tmp_path):
    path = str(tmp_path / "tbl")
    tiles.write.parquet(path)
    got = read_tile_table(spark, path, bbox=(2, 2, 9, 9), zoom_range=(4, 4))
    expect = tiles.filter(
        (F.col("x").between(2, 9)) & (F.col("y").between(2, 9))
    ).count()
    assert got.count() == expect
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan


def test_tilejson_metadata(spark, tiles):
    tj = tilejson_for(tiles)
    assert tj["tilejson"] == "3.0.0"
    assert tj["minzoom"] == 4 and tj["maxzoom"] == 4
    w, s, e, n = tj["bounds"]
    assert -180 <= w < e <= 180 and -90 <= s < n <= 90
    lvl = tj["levels"][4]
    assert lvl["n_tiles"] == tiles.count()


def test_tar_roundtrip(spark, tiles, tmp_path):
    from versatiles_rs_spark.sources.tar import read_tar, write_tar

    path = str(tmp_path / "tiles.tar")
    n = write_tar(tiles, path)
    assert n == tiles.count()
    back = read_tar(spark, path)
    a = {(r.z, r.x, r.y): bytes(r.bytes) for r in tiles.collect()}
    b = {(r.z, r.x, r.y): bytes(r.bytes) for r in back.collect()}
    assert a == b


def test_tar_deterministic_and_skips_junk(spark, tiles, tmp_path):
    import tarfile as tfmod

    from versatiles_rs_spark.sources.tar import read_tar, write_tar

    p1, p2 = str(tmp_path / "a.tar"), str(tmp_path / "b.tar")
    write_tar(tiles.orderBy("z", "x", "y"), p1)
    write_tar(tiles.orderBy("z", "x", "y"), p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()  # mtime=0, same order
    with tfmod.open(p1, "a") as tf:
        info = tfmod.TarInfo("metadata.json")
        info.size = 2
        import io as _io

        tf.addfile(info, _io.BytesIO(b"{}"))
    assert read_tar(spark, p1).count() == tiles.count()
