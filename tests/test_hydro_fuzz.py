"""Differential fuzzing for the hydrology operators: random small DEMs
(few distinct levels -> maximal plateaus, sinks and D8 ties — the cases
golden fixtures undersample) run through the DISTRIBUTED machinery and
must match the single-global-array evaluation bit for bit.  Deterministic
seeds, like test_fuzz_oracle.py."""

import numpy as np
import pytest

from versatiles_rs_spark.codecs import encode_png
from versatiles_rs_spark.operators.hydro import fill_depressions, flow_accumulation

from test_hydro import global_accumulation, global_priority_flood


def random_dem(seed: int, n: int, levels: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, levels, size=(n, n)).astype(np.int64)


def dem_to_tiles(spark, v: np.ndarray, ts: int):
    n = v.shape[0]
    rows = []
    for ty in range(n // ts):
        for tx in range(n // ts):
            sub = v[ty * ts : (ty + 1) * ts, tx * ts : (tx + 1) * ts]
            rows.append(
                (tx, ty, encode_png(np.ascontiguousarray(sub).astype(np.uint8)[:, :, None]))
            )
    return spark.createDataFrame(rows, "x long, y long, bytes binary")


@pytest.mark.parametrize("seed,levels,s", [(101, 6, 1), (202, 3, 2), (303, 40, 1)])
def test_fuzz_flow_accumulation(spark, seed, levels, s):
    """Random plateau-heavy DEMs: two-phase accumulation == global
    level-synchronous evaluation on every universe pixel."""
    n, ts = 64, 16
    v = random_dem(seed, n, levels)
    exp, valid = global_accumulation(v)
    pdf = flow_accumulation(
        dem_to_tiles(spark, v, ts), tile_size=ts, super_tiles=s
    ).toPandas()
    assert len(pdf) == int(valid.sum())
    got = np.zeros_like(exp)
    got[pdf["gy"].to_numpy() - 1, pdf["gx"].to_numpy() - 1] = pdf["acc"].to_numpy()
    np.testing.assert_array_equal(got, exp * valid)


@pytest.mark.parametrize("seed,levels,s", [(909, 6, 1), (111, 3, 2)])
def test_fuzz_max_semiring(spark, seed, levels, s):
    """combine="max" on random plateau-heavy DEMs: the upstream-peak
    surface from the two-phase machinery == global np.maximum.at
    evaluation — exercises max-mode exit-partial folding and the coarse
    max-relaxation across random tie-broken flow graphs."""
    n, ts = 64, 16
    v = random_dem(seed, n, levels)
    wf = lambda e: e + 1
    exp, valid = global_accumulation(v, weight_fn=wf, combine="max")
    pdf = flow_accumulation(
        dem_to_tiles(spark, v, ts), tile_size=ts, super_tiles=s,
        weight_fn=wf, combine="max",
    ).toPandas()
    got = np.zeros_like(exp)
    got[pdf["gy"].to_numpy() - 1, pdf["gx"].to_numpy() - 1] = pdf["acc"].to_numpy()
    np.testing.assert_array_equal(got, exp * valid)


@pytest.mark.parametrize("seed,levels,s", [(404, 5, 1), (505, 12, 2), (606, 3, 1)])
def test_fuzz_fill_depressions(spark, seed, levels, s):
    """Random DEMs are riddled with depressions and flat ties — the
    cross-tile watershed merge and the driver minimax must reproduce the
    sequential global Priority-Flood exactly."""
    n, ts = 64, 16
    v = random_dem(seed, n, levels)
    exp = global_priority_flood(v)
    pdf = fill_depressions(
        dem_to_tiles(spark, v, ts), tile_size=ts, super_tiles=s
    ).toPandas()
    assert len(pdf) == n * n
    got = np.zeros_like(exp)
    got[pdf["gy"].to_numpy(), pdf["gx"].to_numpy()] = pdf["filled"].to_numpy()
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("seed,levels,s", [(707, 7, 1), (808, 4, 2)])
def test_fuzz_weighted_runoff(spark, seed, levels, s):
    """Rainfall-weighted accumulation (weight = elev + 1) on random DEMs
    == global weighted evaluation — linearity means the two-phase
    machinery must carry weights exactly, including across inflows."""
    n, ts = 64, 16
    v = random_dem(seed, n, levels)
    wf = lambda e: e + 1
    exp, valid = global_accumulation(v, weight_fn=wf)
    pdf = flow_accumulation(
        dem_to_tiles(spark, v, ts), tile_size=ts, super_tiles=s, weight_fn=wf
    ).toPandas()
    got = np.zeros_like(exp)
    got[pdf["gy"].to_numpy() - 1, pdf["gx"].to_numpy() - 1] = pdf["acc"].to_numpy()
    np.testing.assert_array_equal(got, exp * valid)


@pytest.mark.parametrize("seed,levels,s", [(121, 3, 1), (232, 5, 2), (343, 2, 1)])
def test_fuzz_resolve_flats(spark, seed, levels, s):
    """Random plateau-heavy DEMs: distributed flat resolution (slim BFS
    across super-tile rounds) == global multi-source BFS, both the
    distance field and the tie-broken directions, bit for bit."""
    from test_hydro import _resolve_flats_check

    n = 64
    v = random_dem(seed, n, levels)
    _resolve_flats_check(spark, v, 16, s)


@pytest.mark.parametrize("seed,levels,s", [(454, 3, 1), (565, 5, 2), (676, 2, 1)])
def test_fuzz_fill_resolve_accumulate(spark, seed, levels, s):
    """The full TauDEM chain on random plateau-heavy DEMs: distributed
    fill -> resolve_flats -> flow_accumulation(d8_override) == the global
    sequential equivalent (Priority-Flood, BFS flat resolution, then
    (elev, dist)-ordered accumulation), bit for bit.  Random low-level
    DEMs maximize filled lakes and cross-tile flats, so the widened
    pointer doubling and the equal-elevation coarse edges are on the
    path."""
    from test_hydro import (
        global_accumulation,
        global_priority_flood,
        global_resolve_flats,
    )
    from versatiles_rs_spark.operators.hydro import resolve_flats

    n, ts = 64, 16
    v = random_dem(seed, n, levels)
    filled = global_priority_flood(v)
    flats = global_resolve_flats(filled)
    exp, valid = global_accumulation(filled, flats=flats)
    filled_tiles = fill_depressions(
        dem_to_tiles(spark, v, ts), tile_size=ts, super_tiles=s, emit="tiles"
    ).select("x", "y", "bytes").localCheckpoint()
    resolved = resolve_flats(filled_tiles, tile_size=ts, super_tiles=s)
    pdf = flow_accumulation(
        filled_tiles, tile_size=ts, super_tiles=s, d8_override=resolved
    ).toPandas()
    assert len(pdf) == int(valid.sum())
    got = np.zeros_like(exp)
    got[pdf["gy"].to_numpy() - 1, pdf["gx"].to_numpy() - 1] = pdf["acc"].to_numpy()
    np.testing.assert_array_equal(got, exp * valid)
