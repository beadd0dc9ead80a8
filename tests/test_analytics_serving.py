"""Analytics tiles are ordinary tile rows: choropleth/flow MVT output
round-trips through the mbtiles container and the serve shim byte-exactly
(the 'flows straight into sinks/containers/serve' claim, proven)."""

import urllib.request

from versatiles_rs_spark.server import serve_tiles
from versatiles_rs_spark.sources.mbtiles import read_mbtiles, write_mbtiles
from versatiles_rs_spark.vector_tile import (
    cells_to_choropleth_tiles,
    decode_vector_tile,
    flows_to_vector_tiles,
)


def test_choropleth_to_mbtiles_to_serve(spark, tmp_path):
    cells = spark.createDataFrame(
        [(0, 0, 2.5), (1, 0, -1.0), (5, 6, 0.75)], "x long, y long, gi double"
    )
    tiles = cells_to_choropleth_tiles(cells, cell_zoom=6, render_zoom=4)
    want = {(r["z"], r["x"], r["y"]): bytes(r["bytes"]) for r in tiles.collect()}

    # container round-trip
    path = str(tmp_path / "choropleth.mbtiles")
    n = write_mbtiles(tiles.select("z", "x", "y", "bytes"), path, {"format": "pbf"})
    assert n == len(want)
    back = {
        (r["z"], r["x"], r["y"]): bytes(r["bytes"])
        for r in read_mbtiles(spark, path).collect()
    }
    assert back == want

    # serve shim round-trip (identity encoding)
    server, url = serve_tiles(
        read_mbtiles(spark, path), tile_fmt="pbf", tile_codec="none"
    )
    try:
        (z, x, y) = next(iter(want))
        req = urllib.request.Request(f"{url}/tiles/{z}/{x}/{y}")
        body = urllib.request.urlopen(req, timeout=30).read()
        assert body == want[(z, x, y)]
        layers = decode_vector_tile(body)
        assert layers[0]["name"] == "cells"
    finally:
        server.shutdown()


def test_flow_tiles_container_roundtrip(spark, tmp_path):
    flows = spark.createDataFrame(
        [(0, 0, 5, 6, 3, 2), (63, 63, 63, 60, 2, 2)],
        "o_x long, o_y long, d_x long, d_y long, n_trips long, n_users long",
    )
    tiles = flows_to_vector_tiles(flows, cell_zoom=6, render_zoom=4)
    want = {(r["z"], r["x"], r["y"]): bytes(r["bytes"]) for r in tiles.collect()}
    path = str(tmp_path / "flows.mbtiles")
    write_mbtiles(tiles.select("z", "x", "y", "bytes"), path, {"format": "pbf"})
    back = {
        (r["z"], r["x"], r["y"]): bytes(r["bytes"])
        for r in read_mbtiles(spark, path).collect()
    }
    assert back == want
