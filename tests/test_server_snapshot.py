"""Versioned tile serving (server.serve_snapshot_tiles): merge-on-read
point lookups, ?v= time travel, zone-map-pruned file planning, 404s."""

import urllib.error
import urllib.request

import pandas as pd
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.server import get_tile_snapshot, serve_snapshot_tiles
from versatiles_rs_spark.sinks.snapshots import SnapshotTable


def _tiles(spark, rows, v):
    pdf = pd.DataFrame(rows, columns=["z", "x", "y", "bytes", "fmt"])
    return spark.createDataFrame(
        pdf, schema="z int, x long, y long, bytes binary, fmt string"
    ).withColumn("_v", F.lit(v))


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.read()


def test_snapshot_serving_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stat_cols=["z", "x", "y"])
    t.commit_overwrite(
        _tiles(spark, [(3, 1, 1, b"old-11", "bin"), (3, 2, 2, b"t-22", "bin")], 0),
        commit_id="base",
    )
    t.commit_append(_tiles(spark, [(3, 1, 1, b"NEW-11", "bin")], 1), commit_id="r1")

    # lookup-level merge-on-read + pruned planning
    assert bytes(get_tile_snapshot(t, 3, 1, 1).bytes) == b"NEW-11"
    assert bytes(get_tile_snapshot(t, 3, 1, 1, version=0).bytes) == b"old-11"
    assert get_tile_snapshot(t, 3, 9, 9) is None
    # the zone maps actually prune: the (2,2) lookup plans only base's file
    assert len(t.plan_files(prune={"z": 3, "x": 2, "y": 2})) < len(t.plan_files())

    srv, url = serve_snapshot_tiles(spark, str(tmp_path / "t"), tile_fmt="bin")
    try:
        assert _get(f"{url}/tiles/3/1/1") == b"NEW-11"
        assert _get(f"{url}/tiles/3/1/1?v=0") == b"old-11"
        assert _get(f"{url}/tiles/3/2/2") == b"t-22"
        assert b'"tilejson"' in _get(f"{url}/tiles.json")
        with pytest.raises(urllib.error.HTTPError) as e1:
            _get(f"{url}/tiles/3/9/9")
        assert e1.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as e2:
            _get(f"{url}/tiles/3/1/1?v=7")  # never-committed version
        assert e2.value.code == 404
    finally:
        srv.shutdown()
