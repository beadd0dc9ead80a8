"""Mobility ETL job (jobs/mobility_job.py): stage commits + resume."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "jobs"))


def test_mobility_job_commits_and_resumes(spark, tmp_path):
    import mobility_job

    out = str(tmp_path / "mob")
    cold = mobility_job.run(
        spark, n_users=60, n_fixes=16, n_segs=2000, out=out
    )
    assert cold["fix_rows"] == 60 * 16
    assert cold["matched_users"] > 0
    assert cold["od_pairs"] > 0
    assert cold["balanced_mass_milli"] > 0
    assert cold["contact_pairs"] >= 0
    assert cold["exported_tiles"] > 0
    assert not cold["export_resumed"]

    warm = mobility_job.run(
        spark, n_users=60, n_fixes=16, n_segs=2000, out=out
    )
    for k in ("fixes", "segments", "matched", "od", "balanced", "contacts"):
        assert warm[f"{k}_resumed"], k
    assert warm["export_resumed"]
    for k in ("fix_rows", "matched_users", "od_pairs", "balanced_mass_milli",
              "contact_pairs", "exported_tiles"):
        assert warm[k] == cold[k], k

    # the exported container decodes as real MVT
    from versatiles_rs_spark.sources.mbtiles import read_mbtiles
    from versatiles_rs_spark.vector_tile import decode_vector_tile

    rows = read_mbtiles(spark, os.path.join(out, "visits.mbtiles")).limit(1).collect()
    layers = decode_vector_tile(bytes(rows[0]["bytes"]))
    assert any(l["name"] == "visits" for l in layers)
