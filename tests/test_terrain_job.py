"""Terrain ETL job (jobs/terrain_job.py): stage commits + resume."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "jobs"))


def test_terrain_job_commits_and_resumes(spark, tmp_path):
    import terrain_job

    out = str(tmp_path / "terrain")
    cold = terrain_job.run(
        spark, zoom=1, out=out, min_accum=64, super_tiles=1, bowls=False
    )
    # dem fixture is depression-free at zoom 1, so the filled surface ==
    # the raw one and the stream stats match the oracle-verified
    # flow_accum/stream_tiles registry numbers exactly
    assert cold["n_tiles"] == 4
    assert cold["watershed_nodes"] > 0
    assert cold["stream_pixels"] == 10016 and cold["max_accum"] == 468
    assert cold["n_basins"] == 66098
    # this fixture's channels never meet (0 confluences, measured), so
    # the order surface is all-1 — the stage still runs the contraction
    assert cold["max_order"] == 1
    assert cold["exported_tiles"] > 0
    assert not cold["export_resumed"]

    warm = terrain_job.run(
        spark, zoom=1, out=out, min_accum=64, super_tiles=1, bowls=False
    )
    for k in ("dem", "filled", "streams", "basins", "orders"):
        assert warm[f"{k}_resumed"], k
    assert warm["export_resumed"]
    # resumed run reproduces every stat from the committed stages
    for k in ("n_tiles", "stream_pixels", "max_accum", "n_basins", "max_order",
              "exported_tiles"):
        assert warm[k] == cold[k], k

    # the exported container is a real mbtiles the engine can read back
    from versatiles_rs_spark.sources.mbtiles import read_mbtiles
    from versatiles_rs_spark.vector_tile import decode_vector_tile

    rows = read_mbtiles(spark, os.path.join(out, "streams.mbtiles")).limit(1).collect()
    layers = decode_vector_tile(bytes(rows[0]["bytes"]))
    assert layers[0]["name"] == "streams" and layers[0]["features"]
