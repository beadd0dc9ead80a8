"""Real MVT protobuf framing tests — including the reference repo's actual
shortbread-tile.pbf fixture (the reference's own test is a from/to-blob
round-trip on this file: versatiles_geometry/src/vector_tile/tile.rs:100-118)."""

import os

import pytest

from versatiles_rs_spark.mvt_pbf import decode_mvt, encode_mvt

SHORTBREAD = "/root/reference/testdata/shortbread-tile.pbf"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SHORTBREAD), reason="reference testdata not present"
)


def _load():
    with open(SHORTBREAD, "rb") as f:
        return decode_mvt(f.read())


def test_shortbread_layer_inventory():
    """Real-world payload goldens: layer names, extents, feature counts."""
    layers = _load()
    inv = {l["name"]: len(l["features"]) for l in layers}
    assert inv == {
        "place_labels": 6,
        "addresses": 2609,
        "water_lines": 1,
        "street_polygons": 11,
        "streets_polygons_labels": 11,
        "streets": 4224,
        "street_labels": 608,
        "public_transport": 4,
        "buildings": 2328,
        "water_polygons": 7,
        "water_polygons_labels": 2,
        "land": 871,
        "sites": 333,
    }
    assert all(l["extent"] == 4096 and l["version"] == 2 for l in layers)
    assert sum(inv.values()) == 11015


def test_shortbread_geometry_and_props():
    layers = _load()
    by_name = {l["name"]: l for l in layers}
    # every geometry decodes to in-extent-ish integer coords (buffer allows
    # some overflow; MVT spec permits coords outside [0, extent))
    streets = by_name["streets"]
    assert {f["type"] for f in streets["features"]} == {2}  # linestrings
    pts = [p for f in streets["features"][:50] for part in f["geometry"] for p in part]
    assert all(-1024 <= x <= 5120 and -1024 <= y <= 5120 for x, y in pts)
    # typed property values survive (shortbread uses strings + ints)
    kinds = {f["props"].get("kind") for f in streets["features"][:100]}
    assert kinds and all(isinstance(k, str) for k in kinds if k is not None)
    assert {f["type"] for f in by_name["buildings"]["features"]} == {3}  # polygons


def test_shortbread_roundtrip_exact():
    """Decode -> encode -> decode is lossless (the reference's own test)."""
    layers = _load()
    rt = decode_mvt(encode_mvt(layers))
    assert len(rt) == len(layers)
    for a, b in zip(layers, rt):
        assert a["name"] == b["name"] and a["extent"] == b["extent"]
        assert len(a["features"]) == len(b["features"])
        for fa, fb in zip(a["features"], b["features"]):
            assert fa["id"] == fb["id"] and fa["type"] == fb["type"]
            assert fa["geometry"] == fb["geometry"]
            assert fa["props"] == fb["props"]


def test_payload_ops_on_real_mvt(spark):
    """The payload-level vector ops must work on real protobuf tiles and
    re-emit protobuf (sniff dispatch)."""
    import pandas as pd

    from versatiles_rs_spark.vector_tile import filter_layers_payload

    blob = open(SHORTBREAD, "rb").read()
    df = spark.createDataFrame(
        pd.DataFrame({"z": [14], "x": [0], "y": [0], "bytes": [blob]}),
        schema="z long, x long, y long, bytes binary",
    )
    out = filter_layers_payload(df, ["streets", "buildings"]).collect()
    kept = decode_mvt(bytes(out[0].bytes))
    assert {l["name"] for l in kept} == {"streets", "buildings"}
    assert sum(len(l["features"]) for l in kept) == 4224 + 2328


def test_vtv1_mvt_transcode():
    """VTV1 <-> MVT transcode is lossless for string-prop tiles."""
    from versatiles_rs_spark.vector_tile import decode_vector_tile, encode_vector_tile

    layers = [
        {
            "name": "pts",
            "extent": 4096,
            "features": [
                {"id": 7, "type": 1, "geometry": [[(10, 20)], [(30, 40)]],
                 "props": {"kind": "poi", "rank": "3"}},
            ],
        }
    ]
    via_mvt = decode_mvt(encode_mvt(layers))
    blob = encode_vector_tile(via_mvt)
    back = decode_vector_tile(blob)
    assert back[0]["features"][0]["geometry"] == layers[0]["features"][0]["geometry"]
    assert back[0]["features"][0]["props"] == layers[0]["features"][0]["props"]
