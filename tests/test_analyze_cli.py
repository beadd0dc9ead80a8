"""analyze CLI: the spatial-analytics toolbox over a parquet point table."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pts_parquet(spark, sf_dir, tmp_path_factory):
    from pyspark.sql import functions as F

    from versatiles_rs_spark.udfs import derived_lat_expr, derived_lon_expr

    out = str(tmp_path_factory.mktemp("analyze") / "pts.parquet")
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_id",
            "user_id",
            derived_lon_expr(F.col("event_id")).alias("lon"),
            derived_lat_expr(F.col("event_id")).alias("lat"),
            "ts",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def run_analyze(*argv):
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "analyze.py"), *argv,
         "--master", "local[4]"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-1500:]
    return json.loads([l for l in res.stdout.splitlines() if l.startswith("{")][0])


@pytest.mark.slow
def test_analyze_all(pts_parquet):
    out = run_analyze("all", pts_parquet, "--zoom", "5", "--eps", "6.0",
                      "--top", "3", "--id", "event_id")
    assert out["n_points"] == 1000
    hs = out["hotspots"]
    assert hs["cells"] > 0 and len(hs["top"]) == 3
    # top list is sorted by gi desc and every z-significant cell is counted
    gis = [r["gi"] for r in hs["top"]]
    assert gis == sorted(gis, reverse=True) and hs["significant"] > 0
    tr = out["trends"]
    assert tr["cells"] == hs["cells"]  # same occupied-cell set at same zoom
    em = out["emerging"]
    assert em["cells"] == hs["cells"]
    od = out["od"]
    assert od["flows"] > 0 and od["self_flows"] <= od["flows"]
    trips = [r["n_trips"] for r in od["top"]]
    assert trips == sorted(trips, reverse=True)
    db = out["dbscan"]
    assert db["core"] + db["border"] + db["noise"] == 1000
    assert db["min_pts"] >= 1  # adaptive threshold resolved and reported
    if db["clusters"]:
        assert db["largest"][0]["size"] >= 1
    mo = out["moran"]
    assert -1.5 < mo["i"] < 1.5 and set(mo["quadrants"]) <= {"HH", "LL", "HL", "LH", "NS"}
    assert sum(mo["quadrants"].values()) == hs["cells"]  # LISA rows = occupied cells
    kd = out["kde"]
    assert kd["cells"] >= hs["cells"]  # kernel footprint covers occupied cells
    dens = [r["density"] for r in kd["top"]]
    assert dens == sorted(dens, reverse=True)
    cl = out["clusters"]
    assert cl["zooms"]["5"] > 0  # JSON round-trip stringifies the zoom keys
    assert sum(r["n_points"] for r in cl["top"]) <= 1000
    bubbles = [r["n_points"] for r in cl["top"]]
    assert bubbles == sorted(bubbles, reverse=True)


@pytest.mark.slow
def test_analyze_new_stats(pts_parquet):
    out = run_analyze("all", pts_parquet, "--zoom", "5", "--eps", "6.0",
                      "--top", "3", "--id", "event_id")
    ge = out["geary"]
    assert 0.0 < ge["c"] < 2.0
    rp = out["ripley"]
    assert [r["r_deg"] for r in rp["radii"]] == [0.25, 0.5, 1.0]
    assert all(r["n"] == 1000 for r in rp["radii"])
    # K is monotone in r (pair sets nest)
    ks = [r["k"] for r in rp["radii"]]
    assert ks == sorted(ks)
    idw = out["idw"]
    assert idw["filled_cells"] > 0
    ests = [r["est_milli"] for r in idw["top"]]
    assert ests == sorted(ests, reverse=True)
    sh = out["shortest"]
    assert sh["reachable_cells"] >= 1
    dists = [r["dist"] for r in sh["top"]]
    assert dists == sorted(dists) and dists[0] == 0


@pytest.mark.slow
def test_analyze_stdbscan_similar(pts_parquet):
    out = run_analyze("stdbscan", pts_parquet, "--eps", "10.0",
                      "--eps-time", "129600", "--id", "event_id", "--top", "3")
    st = out["stdbscan"]
    assert st["core"] + st["border"] + st["noise"] == 1000
    assert st["min_pts"] >= 1
    out = run_analyze("similar", pts_parquet, "--by", "user_id",
                      "--zoom", "6", "--top", "3")
    sm = out["similar"]
    assert sm["pairs"] >= 1
    js = [r["j_milli"] for r in sm["top"]]
    assert js == sorted(js, reverse=True)


@pytest.mark.slow
def test_analyze_coloc(spark, sf_dir, tmp_path_factory):
    # typed points: the REAL event_type column + scatter coords (the linear
    # derivation is a lattice whose close-pair id strides alias the type
    # cycle — udfs.py scatter docstring)
    out_path = str(tmp_path_factory.mktemp("coloc") / "typed.parquet")
    from pyspark.sql import functions as F

    from versatiles_rs_spark.udfs import scatter_lat_expr, scatter_lon_expr

    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_id",
            "event_type",
            scatter_lon_expr(F.col("event_id")).alias("lon"),
            scatter_lat_expr(F.col("event_id")).alias("lat"),
        )
        .coalesce(1)
        .write.mode("overwrite").parquet(out_path)
    )
    out = run_analyze("coloc", out_path, "--id", "event_id", "--top", "3",
                      "--radius-deg", "8.0")
    co = out["coloc"]
    assert co["pairs"] >= 1
    pis = [r["pi_milli"] for r in co["top"]]
    assert pis == sorted(pis, reverse=True)


def test_analyze_hydro_over_mbtiles(spark, tmp_path):
    """The hydro command reads DEM tiles out of a CONTAINER and reports
    exact, fixture-deterministic basin + stream statistics (numbers pinned
    against the oracle-verified d8_basins / flow_accum registry queries)."""
    from pyspark.sql import functions as F

    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.sources.mbtiles import write_mbtiles

    path = str(tmp_path / "dem.mbtiles")
    tiles = fixtures.dem_raster_df(spark, zoom=1, partitions=2).select(
        F.lit(1).alias("z"), "x", "y", "bytes"
    )
    assert write_mbtiles(tiles, path, {"format": "png"}) == 4

    out = run_analyze("hydro", path, "--zoom", "1", "--min-accum", "64")
    h = out["hydro"]
    assert h["n_tiles"] == 4
    assert h["n_pixels"] == 260100
    assert h["n_basins"] == 66098
    assert h["max_accum"] == 468
    assert h["stream_pixels"] == 10016
    # 0 = guarded driver Kahn solve of the coarse graph (default path)
    assert h["coarse_rounds"] >= 0
    assert h["largest_basins"][0]["n_px"] >= h["largest_basins"][-1]["n_px"]
    # channels on this fixture never meet (0 confluences, measured):
    # every stream cell is order 1 and the junction count is zero
    assert h["strahler_orders"] == {"1": 10016}
    assert h["n_junctions"] == 0


def test_analyze_hydro_fill_over_mbtiles(spark, tmp_path):
    """--fill runs Priority-Flood first: on the pitted fixture the
    reported fill volume is exactly sum(spill - floor) over the pits'
    closed forms, and basins collapse onto the filled surface."""
    from pyspark.sql import functions as F

    from versatiles_rs_spark.fixtures import DEM_BOWLS, bowl_spill, dem_bowls_raster_df
    from versatiles_rs_spark.sources.mbtiles import write_mbtiles

    path = str(tmp_path / "bowls.mbtiles")
    tiles = dem_bowls_raster_df(spark, partitions=2).select(
        F.lit(1).alias("z"), "x", "y", "bytes"
    )
    assert write_mbtiles(tiles, path, {"format": "png"}) == 4

    out = run_analyze("hydro", path, "--zoom", "1", "--fill")
    h = out["hydro"]
    exp_pixels = sum((2 * r + 1) ** 2 for _, _, r, _ in DEM_BOWLS)
    exp_volume = sum(
        (2 * r + 1) ** 2 * (bowl_spill(cx, cy, r) - floor)
        for cx, cy, r, floor in DEM_BOWLS
    )
    assert h["filled"]["raised_pixels"] == exp_pixels
    assert h["filled"]["fill_volume"] == exp_volume
    assert h["filled"]["watershed_nodes"] > 0
    assert h["n_pixels"] == 260100


def test_analyze_hydro_fill_resolve_over_mbtiles(spark, tmp_path):
    """--fill --resolve-flats: the filled bowls become flat lakes, flat
    resolution drains every lake cell (no unresolved flats besides
    world-edge plateaus of the fixture), and accumulation routes THROUGH
    the lakes — max_accum must strictly exceed the unresolved run's."""
    from pyspark.sql import functions as F

    from versatiles_rs_spark.fixtures import DEM_BOWLS, dem_bowls_raster_df
    from versatiles_rs_spark.sources.mbtiles import write_mbtiles

    path = str(tmp_path / "bowls.mbtiles")
    tiles = dem_bowls_raster_df(spark, partitions=2).select(
        F.lit(1).alias("z"), "x", "y", "bytes"
    )
    assert write_mbtiles(tiles, path, {"format": "png"}) == 4

    base = run_analyze("hydro", path, "--zoom", "1", "--fill")
    out = run_analyze("hydro", path, "--zoom", "1", "--fill", "--resolve-flats")
    h = out["hydro"]
    exp_lake_pixels = sum((2 * r + 1) ** 2 for _, _, r, _ in DEM_BOWLS)
    # every filled-lake cell resolves (the lakes all have spills)
    assert h["flats"]["resolved_flats"] >= exp_lake_pixels
    assert h["flats"]["bfs_rounds"] >= 1
    # lakes drain: accumulation through a lake beats the stranded run
    assert h["max_accum"] > base["hydro"]["max_accum"]
    assert h["stream_pixels"] >= base["hydro"]["stream_pixels"]


def test_analyze_viewshed_over_mbtiles(spark, tmp_path):
    """The viewshed command reads DEM tiles from a container and reports
    per-observer visible-cell counts matching the kernel directly."""
    import numpy as np
    from pyspark.sql import functions as F

    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.operators.viewshed import viewshed_kernel
    from versatiles_rs_spark.sources.mbtiles import write_mbtiles

    path = str(tmp_path / "dem.mbtiles")
    tiles = fixtures.dem_raster_df(spark, zoom=1, partitions=2).select(
        F.lit(1).alias("z"), "x", "y", "bytes"
    )
    assert write_mbtiles(tiles, path, {"format": "png"}) == 4

    out = run_analyze(
        "viewshed", path, "--zoom", "1", "--radius", "40", "--height", "2",
        "--observers", "256,256;100,400",
    )
    v = out["viewshed"]
    assert v["radius"] == 40 and len(v["observers"]) == 2
    gx = np.arange(512, dtype=np.int64)
    world = fixtures.dem_value(gx[None, :], gx[:, None])
    for ob, (ox, oy) in zip(v["observers"], [(256, 256), (100, 400)]):
        win = world[oy - 40 : oy + 41, ox - 40 : ox + 41]
        want = viewshed_kernel(win.copy(), 40, 40, 40, 2)
        assert ob["cells"] == 81 * 81
        assert ob["visible"] == int(want.sum())
        assert 0 < ob["pct"] < 100


def test_analyze_polygonize_over_mbtiles(spark, tmp_path):
    """The polygonize command reports per-zone feature stats; edge count
    pinned to the oracle-verified polygonize registry query."""
    from pyspark.sql import functions as F

    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.sources.mbtiles import write_mbtiles

    path = str(tmp_path / "dem.mbtiles")
    tiles = fixtures.dem_raster_df(spark, zoom=1, partitions=2).select(
        F.lit(1).alias("z"), "x", "y", "bytes"
    )
    assert write_mbtiles(tiles, path, {"format": "png"}) == 4

    out = run_analyze("polygonize", path, "--zoom", "1", "--band-step", "32")
    p = out["polygonize"]
    assert p["boundary_edges"] == 16282  # == registry-gate row count
    assert p["n_zones"] == len(p["zones"]) >= 2
    for z in p["zones"]:
        assert z["parts"] >= 1 and z["perimeter_vertices"] >= 4


def test_analyze_cost_over_mbtiles(spark, tmp_path):
    """The cost command reports distance/allocation/path stats pinned to
    the wall fixture's closed forms."""
    from pyspark.sql import functions as F

    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.sources.mbtiles import write_mbtiles

    path = str(tmp_path / "cost.mbtiles")
    tiles = fixtures.cost_wall_raster_df(spark, partitions=2).select(
        F.lit(1).alias("z"), "x", "y", "bytes"
    )
    assert write_mbtiles(tiles, path, {"format": "png"}) == 4

    out = run_analyze(
        "cost", path, "--zoom", "1", "--blocked", "255",
        "--sources", "50,100;120,450", "--targets", "305,202",
    )
    c = out["cost"]
    assert c["cells"] == 512 * 512 - 511        # wall cells excluded
    assert c["reachable"] == c["cells"]          # the gap drains everything
    assert c["allocation"][f"1"] + c["allocation"][f"2"] == c["cells"]
    # east side (211*512 cells east of the wall, minus nothing) is all
    # source 1 (gap-nearest), so source 1 dominates
    assert c["allocation"]["1"] > c["allocation"]["2"]
    # path to (305, 202): through the gap -> 255 steps + endpoints
    p = c["paths"][0]
    assert p["tid"] == 1
    # dist(target) = dg + oct(gap, target) = 5800 + (20*1 + 28*2)... octile
    # (dx=5, dy=2): 20*3 + 28*2 = 116
    assert p["total_cost"] == 5800 + 116
    assert p["cells"] == 250 + 5 + 1  # chebyshev legs + both endpoints


def test_analyze_regions_and_distance(pts_parquet):
    out = run_analyze("regions", pts_parquet, "--zoom", "5", "--min-cells", "6")
    rg = out["regions"]
    assert rg["regions"] > rg["after_sieve"] > 0
    assert rg["largest"][0]["n_cells"] >= rg["largest"][-1]["n_cells"]
    # zone histogram covers the whole 32x32 grid
    assert sum(r["n_cells"] for r in rg["largest"]) <= 1024

    out = run_analyze("distance", pts_parquet, "--zoom", "5", "--max-dist", "4")
    dd = out["distance"]
    assert dd["cells_reached"] + dd["cells_unreached"] == 1024
    assert 0 < dd["max_d2"] <= 16


def test_analyze_contacts_and_center(pts_parquet):
    out = run_analyze("contacts", pts_parquet, "--zoom", "4")
    assert out["contacts"]["pairs"] > 0
    assert out["contacts"]["top"][0]["n_contacts"] >= 2
    out2 = run_analyze("center", pts_parquet, "--by", "user_id")
    assert out2["center"]["groups"] > 0
    row = out2["center"]["top"][0]
    assert {"mean_x", "mean_y", "med_x", "med_y"} <= set(row)


def test_analyze_variogram_and_mapmatch(spark, sf_dir, tmp_path_factory):
    from pyspark.sql import functions as F

    from versatiles_rs_spark.udfs import (
        derived_lat_expr, derived_lon_expr, scatter_lat_expr, scatter_lon_expr,
    )

    tmp = tmp_path_factory.mktemp("analyze2")
    vpts = str(tmp / "vpts.parquet")
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_id", "user_id", "ts", "value",
            scatter_lon_expr(F.col("event_id")).alias("lon"),
            scatter_lat_expr(F.col("event_id")).alias("lat"),
        )
        .coalesce(1).write.mode("overwrite").parquet(vpts)
    )
    out = run_analyze("variogram", vpts, "--radius-deg", "1.0", "--bins", "8")
    assert len(out["variogram"]["bins"]) > 0
    assert all(b["n_pairs"] > 0 for b in out["variogram"]["bins"])

    segs = str(tmp / "segs.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")
    okey = F.col("o_orderkey")
    slon = okey * 13 + 5
    sx = F.floor(derived_lon_expr(slon) * 1000).cast("long") + 200000
    sy = F.floor(derived_lat_expr(slon) * 1000).cast("long") + 200000
    (
        od.select(
            okey.alias("sid"), sx.alias("x1"), sy.alias("y1"),
            (sx + (okey.cast("long") * 3571 % 4001) - 2000).alias("x2"),
            (sy + (okey.cast("long") * 28657 % 4001) - 2000).alias("y2"),
        )
        .coalesce(1).write.mode("overwrite").parquet(segs)
    )
    fixes = str(tmp / "fixes.parquet")
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_id", "user_id", "ts",
            derived_lon_expr(F.col("event_id")).alias("lon"),
            derived_lat_expr(F.col("event_id")).alias("lat"),
        )
        .coalesce(1).write.mode("overwrite").parquet(fixes)
    )
    out2 = run_analyze("mapmatch", fixes, "--segments", segs, "--steps", "4")
    assert out2["mapmatch"]["users"] > 0
    assert out2["mapmatch"]["matched_rows"] == 4 * out2["mapmatch"]["users"]


def test_analyze_kmeans(pts_parquet):
    out = run_analyze("kmeans", pts_parquet, "--k", "6", "--rounds", "3")
    assert 1 <= out["kmeans"]["clusters"] <= 6
    assert sum(r["n_points"] for r in out["kmeans"]["top"]) > 0
    if out["kmeans"]["clusters"] >= 2:
        assert 0.0 <= out["kmeans"]["mean_silhouette"] <= 1.0


def test_analyze_imgqc_over_mbtiles(spark, tmp_path):
    """The imgqc command reads raster tiles out of a container and
    reports the two image-quality gate distributions; the DEM fixture's
    numbers are pinned against the blur_gate / tile_entropy registry
    values (var_milli band 1315..1320 at zoom 2 -> here zoom 1; entropy
    ~7.3 bits; a low threshold gates nothing, a high one gates all)."""
    from pyspark.sql import functions as F

    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.sources.mbtiles import write_mbtiles

    path = str(tmp_path / "dem.mbtiles")
    tiles = fixtures.dem_raster_df(spark, zoom=1, partitions=2).select(
        F.lit(1).alias("z"), "x", "y", "bytes"
    )
    assert write_mbtiles(tiles, path, {"format": "png"}) == 4

    out = run_analyze("imgqc", path, "--zoom", "1")
    q = out["imgqc"]
    assert q["tiles"] == 4
    assert 1200 <= q["var_milli"]["min"] <= q["var_milli"]["max"] <= 1400
    assert q["blurry"] == 0  # default 100-milli floor is far below the band
    assert 7.0 <= q["entropy_bits"]["min"] <= q["entropy_bits"]["max"] <= 7.5
    assert q["low_info"] == 0  # default 2-bit floor

    strict = run_analyze("imgqc", path, "--zoom", "1",
                         "--min-var-milli", "5000",
                         "--min-entropy-fp", str(15 << 20))
    assert strict["imgqc"]["blurry"] == 4
    assert strict["imgqc"]["low_info"] == 4
