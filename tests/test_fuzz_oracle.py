"""Differential fuzzing: random geo-bbox/zoom filters, Spark engine vs
DuckDB oracle. Catches tile-boundary drift (eps inset, clamping, pole/
antimeridian edges) that fixed golden cases can miss. Deterministic seeds."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark import tile_math as tm
from versatiles_rs_spark.operators.filter import filter_geo_bbox
from versatiles_rs_spark.udfs import (
    derived_lat_expr,
    derived_lon_expr,
    derived_lonlat_sql,
    tile_xy_sql,
    with_tile_columns,
)


@pytest.fixture(scope="module")
def ducks(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con


def random_boxes(n, seed):
    rng = np.random.default_rng(seed)
    boxes = []
    for _ in range(n):
        z = int(rng.integers(1, 12))
        x0 = float(rng.uniform(-185, 175))  # deliberately allow out-of-range west
        y0 = float(rng.uniform(-88, 80))    # and beyond-mercator south
        w = float(rng.uniform(0.01, 90))
        h = float(rng.uniform(0.01, 60))
        boxes.append((z, x0, y0, min(x0 + w, 185.0), min(y0 + h, 88.0)))
    return boxes


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_bbox_filters_match_oracle(spark, sf_dir, ducks, seed):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lon_sql, lat_sql = derived_lonlat_sql("event_id")
    for z, x0, y0, x1, y1 in random_boxes(12, seed):
        # engine side: derived coords -> tile cols -> geo-bbox filter
        df = ev.withColumn("lon", derived_lon_expr(F.col("event_id"))).withColumn(
            "lat", derived_lat_expr(F.col("event_id"))
        )
        df = with_tile_columns(df, "lon", "lat", zoom=z)
        got = filter_geo_bbox(df, (x0, y0, x1, y1), zoom=z).count()
        # oracle side: the same tile bbox computed by tile_math, as SQL ranges
        tx0, ty0, tx1, ty1 = tm.geo_bbox_to_tile_bbox(z, x0, y0, x1, y1)
        xs, ys = tile_xy_sql(lon_sql, lat_sql, z)
        (expect,) = ducks.execute(
            f"SELECT count(*) FROM events WHERE {xs} BETWEEN {tx0} AND {tx1} "
            f"AND {ys} BETWEEN {ty0} AND {ty1}"
        ).fetchone()
        assert got == expect, (z, x0, y0, x1, y1)


@pytest.mark.parametrize("seed", [5, 97])
def test_random_pyramid_counts_match_oracle(spark, sf_dir, ducks, seed):
    """Multi-level pyramid filter counts (OR of per-level tile bboxes)."""
    from versatiles_rs_spark.operators.filter import filter_pyramid

    rng = np.random.default_rng(seed)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lon_sql, lat_sql = derived_lonlat_sql("event_id")
    for _ in range(4):
        z_min = int(rng.integers(1, 5))
        z_max = z_min + int(rng.integers(1, 4))
        x0 = float(rng.uniform(-170, 120))
        y0 = float(rng.uniform(-70, 40))
        box = (x0, y0, x0 + float(rng.uniform(1, 50)), y0 + float(rng.uniform(1, 30)))
        base = ev.withColumn("lon", derived_lon_expr(F.col("event_id"))).withColumn(
            "lat", derived_lat_expr(F.col("event_id"))
        )
        got = 0
        union_sql = []
        for lvl in range(z_min, z_max + 1):
            df = with_tile_columns(base, "lon", "lat", zoom=lvl)
            got += filter_pyramid(df, box, z_min, z_max).filter(F.col("z") == lvl).count()
            tx0, ty0, tx1, ty1 = tm.geo_bbox_to_tile_bbox(lvl, *box)
            xs, ys = tile_xy_sql(lon_sql, lat_sql, lvl)
            union_sql.append(
                f"SELECT count(*) c FROM events WHERE {xs} BETWEEN {tx0} AND {tx1} "
                f"AND {ys} BETWEEN {ty0} AND {ty1}"
            )
        (expect,) = ducks.execute(
            "SELECT sum(c) FROM (" + " UNION ALL ".join(union_sql) + ")"
        ).fetchone()
        assert got == int(expect), (z_min, z_max, box)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_codec_roundtrips(seed):
    """Random images through every real codec: lossless paths exact, lossy
    paths within the PSNR bound, format sniffing stable."""
    from versatiles_rs_spark import codecs

    rng = np.random.default_rng(seed)
    noise = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    # smooth gradient with random phase: the content class lossy codecs are
    # specified over (PSNR bounds on pure noise are meaningless)
    ox, oy = int(rng.integers(128)), int(rng.integers(128))  # no sawtooth wrap
    y, x = np.mgrid[0:32, 0:32]
    smooth = np.stack(
        [4 * x + ox, 4 * y + oy, (x + y) * 2], axis=-1
    ).astype(np.uint8)
    for img in (smooth, noise):
        png = codecs.decode_image(codecs.encode_image(img, "png"))
        assert (png == img).all()
        if codecs.HAS_WEBP:
            wl = codecs.decode_image(codecs.encode_image(img, "webp", quality=100))
            assert (wl == img).all()
    for fmt, has in (("jpg", codecs.HAS_GD_JPEG), ("webp", codecs.HAS_WEBP),
                     ("avif", codecs.HAS_AVIF)):
        if not has:
            continue
        blob = codecs.encode_image(smooth, fmt, quality=95)
        assert codecs.detect_format(blob) == fmt
        out = codecs.decode_image(blob)
        assert out.shape == smooth.shape
        assert codecs.psnr(smooth, out) >= 30.0


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_mvt_pbf_roundtrip(seed):
    """Random layer/feature/property structures survive MVT protobuf
    encode->decode exactly (geometry, ids, typed values)."""
    from versatiles_rs_spark.mvt_pbf import decode_mvt, encode_mvt

    rng = np.random.default_rng(seed + 77)
    layers = []
    for li in range(int(rng.integers(1, 4))):
        feats = []
        for fi in range(int(rng.integers(1, 6))):
            gtype = int(rng.integers(1, 4))
            if gtype == 1:
                geom = [[(int(rng.integers(0, 4096)), int(rng.integers(0, 4096)))]
                        for _ in range(int(rng.integers(1, 4)))]
            else:
                n = int(rng.integers(2 if gtype == 2 else 3, 6))
                ring = [(int(rng.integers(0, 4096)), int(rng.integers(0, 4096))) for _ in range(n)]
                if gtype == 3:
                    ring.append(ring[0])
                geom = [ring]
            feats.append({
                "id": int(rng.integers(0, 1 << 40)),
                "type": gtype,
                "geometry": geom,
                "props": {
                    f"k{j}": v for j, v in enumerate(
                        [str(rng.integers(100)), int(rng.integers(-5, 5)), bool(rng.integers(2))]
                        [: int(rng.integers(0, 4))]
                    )
                },
            })
        layers.append({"name": f"layer{li}", "extent": 4096, "features": feats})
    rt = decode_mvt(encode_mvt(layers))
    for a, b in zip(layers, rt):
        assert a["name"] == b["name"]
        for fa, fb in zip(a["features"], b["features"]):
            assert fa["id"] == fb["id"] and fa["type"] == fb["type"]
            assert fa["props"] == fb["props"]
            if fa["type"] != 3:
                assert fa["geometry"] == fb["geometry"]


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_brotli_and_versatiles_roundtrip(spark, tmp_path, seed):
    """Random payload sets survive brotli and the .versatiles container."""
    from versatiles_rs_spark.codecs import HAS_BROTLI, compress_blob, decompress_blob

    if not HAS_BROTLI:
        pytest.skip("libbrotli absent")
    rng = np.random.default_rng(seed + 5)
    blobs = [rng.integers(0, 256, int(rng.integers(1, 5000)), dtype=np.uint8).tobytes()
             for _ in range(20)]
    for b in blobs:
        assert decompress_blob(compress_blob(b, "brotli"), "brotli") == b

    import pandas as pd

    from versatiles_rs_spark.sources.versatiles import read_versatiles, write_versatiles

    tiles = []
    used = set()
    for b in blobs:
        z = int(rng.integers(1, 9))
        key = (z, int(rng.integers(0, 1 << z)), int(rng.integers(0, 1 << z)))
        if key in used:
            continue
        used.add(key)
        tiles.append((*key, b))
    df = spark.createDataFrame(
        pd.DataFrame(tiles, columns=["z", "x", "y", "bytes"]),
        schema="z int, x long, y long, bytes binary",
    )
    p = str(tmp_path / f"f{seed}.versatiles")
    write_versatiles(df, p, tile_type="bin")
    got = sorted((r.z, r.x, r.y, bytes(r.bytes)) for r in read_versatiles(spark, p).collect())
    assert got == sorted(tiles)
