"""convert CLI: vpl source -> filtered/flipped -> each layout; round-trips."""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_convert(*argv):
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert.py"), *argv, "--master", "local[4]"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-1500:]
    return json.loads([l for l in res.stdout.splitlines() if l.startswith("{")][0])


@pytest.mark.slow
def test_convert_vpl_to_hilbert_and_dir(spark, tmp_path):
    vpl = tmp_path / "pipe.vpl"
    vpl.write_text('from_debug n=80 zoom=4 format="png" | filter_zoom min=4 max=4 | flip_y\n')
    out1 = str(tmp_path / "tiles_hilbert")
    m1 = run_convert(str(vpl), out1, "--layout", "hilbert", "--dedup")
    assert m1["minzoom"] == m1["maxzoom"] == 4 and m1["n_tiles"] > 0

    # the written table is in verified Hilbert order
    from versatiles_rs_spark.sinks.writers import verify_hilbert_monotonic

    assert verify_hilbert_monotonic(spark, out1)

    # parquet -> directory tree -> read back round trip
    out2 = str(tmp_path / "tiles_dir")
    m2 = run_convert(out1, out2, "--layout", "dir")
    assert m2["n_tiles"] == m1["n_tiles"]
    from versatiles_rs_spark.sources.containers import read_directory_tree

    back = read_directory_tree(spark, out2)
    assert back.count() == m1["n_tiles"]


@pytest.mark.slow
def test_convert_bbox_prunes(tmp_path):
    vpl = tmp_path / "pipe.vpl"
    vpl.write_text("from_debug n=200 zoom=5\n")
    full = run_convert(str(vpl), str(tmp_path / "full"), "--layout", "block", "--dedup")
    pruned = run_convert(
        str(vpl),
        str(tmp_path / "pruned"),
        "--layout",
        "block",
        "--bbox=-90,-45,90,45",
        "--bbox-zoom",
        "5",
        "--dedup",
    )
    assert 0 < pruned["n_tiles"] < full["n_tiles"]


@pytest.mark.slow
def test_convert_mbtiles_roundtrip(spark, tmp_path):
    """vpl -> .mbtiles -> parquet: the reference's berlin.mbtiles flow."""
    vpl = tmp_path / "p.vpl"
    vpl.write_text("from_debug n=40 zoom=3\n")
    mb = str(tmp_path / "t.mbtiles")
    m1 = run_convert(str(vpl), mb, "--dedup")
    pq = str(tmp_path / "back")
    m2 = run_convert(mb, pq, "--layout", "hilbert")
    assert m2["n_tiles"] == m1["n_tiles"] > 0
    from versatiles_rs_spark.sources.mbtiles import read_mbtiles

    a = {(r.z, r.x, r.y): bytes(r.bytes) for r in read_mbtiles(spark, mb).collect()}
    b = {(r.z, r.x, r.y): bytes(r.bytes) for r in spark.read.parquet(pq).select("z","x","y","bytes").collect()}
    assert a == b


def test_convert_versatiles_roundtrip(spark, tmp_path):
    """vpl -> .versatiles -> parquet: the namesake container through the CLI."""
    vpl = tmp_path / "p.vpl"
    vpl.write_text("from_debug n=40 zoom=3\n")
    vt = str(tmp_path / "t.versatiles")
    m1 = run_convert(str(vpl), vt, "--dedup")
    pq = str(tmp_path / "back")
    m2 = run_convert(vt, pq, "--layout", "hilbert")
    assert m2["n_tiles"] == m1["n_tiles"] > 0
    from versatiles_rs_spark.sources.versatiles import read_versatiles

    a = {(r.z, r.x, r.y): bytes(r.bytes) for r in read_versatiles(spark, vt).collect()}
    b = {(r.z, r.x, r.y): bytes(r.bytes) for r in spark.read.parquet(pq).select("z","x","y","bytes").collect()}
    assert a == b


@pytest.mark.slow
def test_convert_snapshot_table_to_pmtiles(spark, tmp_path):
    """A refresh-pipeline snapshot level converts straight to a container:
    the CLI reads the merged (newest-_v) view, so the published archive
    reflects the refresh, not the stale base tile."""
    import pandas as pd

    from versatiles_rs_spark.sinks.snapshots import SnapshotTable
    from versatiles_rs_spark.sources.pmtiles import read_pmtiles

    def tiles(rows, v):
        pdf = pd.DataFrame(rows, columns=["z", "x", "y", "bytes", "fmt"])
        return spark.createDataFrame(
            pdf, schema="z int, x long, y long, bytes binary, fmt string"
        ).withColumn("_v", F.lit(v))

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(
        tiles([(2, 1, 1, b"old", "png"), (2, 2, 2, b"keep", "png")], 0), commit_id="base"
    )
    t.commit_append(tiles([(2, 1, 1, b"NEW", "png")], 1), commit_id="r1")
    dst = str(tmp_path / "out.pmtiles")
    run_convert(str(tmp_path / "t"), dst)
    got = {(r.z, r.x, r.y): bytes(r.bytes) for r in read_pmtiles(spark, dst).collect()}
    assert got == {(2, 1, 1): b"NEW", (2, 2, 2): b"keep"}
