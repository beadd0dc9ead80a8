"""End-to-end incremental refresh job (jobs/refresh_job.py): diff-pruned
work-list, byte-exact merge-on-read vs full rebuild, idempotent resume."""

import numpy as np
from pyspark.sql import functions as F

from jobs.refresh_job import make_base, read_latest, run
from versatiles_rs_spark.fixtures import splitmix64
from versatiles_rs_spark.operators.raster import build_pyramid


def test_refresh_job_end_to_end(spark, tmp_path):
    out = str(tmp_path / "pyr")
    z_max, refresh_mod = 2, 4
    tables, metrics = run(spark, out, z_max=z_max, z_min=0, versions=1,
                          refresh_mod=refresh_mod)

    # 1. the work-list was diff-pruned to exactly the hot (re-rendered) keys
    g = 1 << z_max
    hot = {
        divmod(k, g)
        for k in range(g * g)
        if int(splitmix64(np.array([k], dtype=np.uint64))[0] % np.uint64(refresh_mod)) == 0
    }
    changed = metrics[-1]["changed_per_level"][str(z_max)]
    assert 0 < changed == len(hot) < g * g
    base_delta = {
        (r.x, r.y)
        for r in tables[z_max].changes(0).select("x", "y").collect()
    }
    assert base_delta == hot

    # 2. merge-on-read equals a full rebuild of the v1 content, byte-exact
    full = build_pyramid(
        make_base(spark, z_max, content_version=1, refresh_mod=refresh_mod),
        z_max, 0,
    )
    for z in range(z_max + 1):
        got = {(r.x, r.y): bytes(r.bytes) for r in read_latest(tables[z]).collect()}
        want = {(r.x, r.y): bytes(r.bytes) for r in full[z].collect()}
        assert got == want, f"level {z} diverged"

    # 3. re-running the same refresh is a committed no-op (resume contract)
    versions_before = {z: tables[z].current_version() for z in tables}
    _, m2 = run(spark, out, z_max=z_max, z_min=0, versions=1, refresh_mod=refresh_mod)
    assert m2[-1]["op"] == "resume-noop"
    assert {z: tables[z].current_version() for z in tables} == versions_before
