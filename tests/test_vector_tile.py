"""Vector tile codec: MVT 2.1 spec golden command streams, round-trips,
Spark builders (per-tile grouping, layer filter, merge)."""

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.vector_tile import (
    LINESTRING,
    POINT,
    POLYGON,
    decode_geometry,
    decode_vector_tile,
    encode_geometry,
    encode_vector_tile,
    filter_layers_payload,
    merge_vector_payloads,
    points_to_vector_tiles,
)


class TestGeometryCommands:
    def test_point_golden_mvt_spec(self):
        """MVT 2.1 spec §4.3.5.1: point (25,17) -> [9, 50, 34]."""
        assert encode_geometry([[(25, 17)]], POINT) == [9, 50, 34]

    def test_multipoint_golden_mvt_spec(self):
        """Spec: points (5,7),(3,2) -> [17, 10, 14, 3, 9]."""
        assert encode_geometry([[(5, 7)], [(3, 2)]], POINT) == [17, 10, 14, 3, 9]

    def test_linestring_golden_mvt_spec(self):
        """Spec: line (2,2)->(2,10)->(10,10) -> [9, 4, 4, 18, 0, 16, 16, 0]."""
        assert encode_geometry([[(2, 2), (2, 10), (10, 10)]], LINESTRING) == [
            9, 4, 4, 18, 0, 16, 16, 0,
        ]

    def test_polygon_golden_mvt_spec(self):
        """Spec: ring (3,6)->(8,12)->(20,34) closed ->
        [9, 6, 12, 18, 10, 12, 24, 44, 15]."""
        ring = [(3, 6), (8, 12), (20, 34), (3, 6)]
        assert encode_geometry([ring], POLYGON) == [9, 6, 12, 18, 10, 12, 24, 44, 15]

    @pytest.mark.parametrize(
        "gtype,parts",
        [
            (POINT, [[(0, 0)], [(-5, 3)], [(100, -200)]]),
            (LINESTRING, [[(2, 2), (2, 10), (10, 10)], [(1, 1), (3, 5)]]),
            (POLYGON, [[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]]),
        ],
    )
    def test_roundtrip(self, gtype, parts):
        dec = decode_geometry(encode_geometry(parts, gtype), gtype)
        assert dec == [list(p) for p in parts]


class TestContainer:
    def test_tile_roundtrip(self):
        layers = [
            {
                "name": "roads",
                "extent": 4096,
                "features": [
                    {"id": 7, "type": LINESTRING, "geometry": [[(0, 0), (5, 5)]],
                     "props": {"class": "primary"}},
                ],
            },
            {
                "name": "pois",
                "extent": 4096,
                "features": [
                    {"id": 1, "type": POINT, "geometry": [[(25, 17)]], "props": {}},
                ],
            },
        ]
        back = decode_vector_tile(encode_vector_tile(layers))
        assert [l["name"] for l in back] == ["roads", "pois"]
        assert back[0]["features"][0]["props"] == {"class": "primary"}
        assert back[1]["features"][0]["geometry"] == [[(25, 17)]]

    def test_deterministic_bytes(self):
        layers = [{"name": "a", "extent": 4096, "features": [
            {"id": 1, "type": POINT, "geometry": [[(1, 2)]], "props": {"b": "2", "a": "1"}}]}]
        assert encode_vector_tile(layers) == encode_vector_tile(layers)

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="VTV1"):
            decode_vector_tile(b"nope")


class TestSparkBuilders:
    @pytest.fixture(scope="class")
    def points(self, spark):
        from versatiles_rs_spark.udfs import derived_lat_expr, derived_lon_expr

        return spark.range(0, 400).select(
            F.col("id").alias("feature_id"),
            derived_lon_expr(F.col("id")).alias("lon"),
            derived_lat_expr(F.col("id")).alias("lat"),
            F.create_map(F.lit("n"), F.col("id").cast("string")).alias("props"),
        )

    def test_points_to_tiles(self, spark, points):
        tiles = points_to_vector_tiles(points, zoom=3).cache()
        assert tiles.agg(F.sum("n_features")).first()[0] == 400
        row = tiles.orderBy(F.desc("n_features")).first()
        layers = decode_vector_tile(bytes(row.bytes))
        assert layers[0]["name"] == "points"
        assert len(layers[0]["features"]) == row.n_features
        # local coords within extent
        for f in layers[0]["features"]:
            (x, y) = f["geometry"][0][0]
            assert 0 <= x < 4096 and 0 <= y < 4096
            assert f["props"]["n"] == str(f["id"])

    def test_filter_layers_payload(self, spark, points):
        tiles = points_to_vector_tiles(points, zoom=3)
        kept = filter_layers_payload(tiles, ["points"])
        dropped = filter_layers_payload(tiles, ["points"], invert=True)
        k = decode_vector_tile(bytes(kept.first().bytes))
        d = decode_vector_tile(bytes(dropped.first().bytes))
        assert [l["name"] for l in k] == ["points"] and d == []

    def test_merge_vector_payloads(self, spark, points):
        a = points_to_vector_tiles(points.filter(F.col("feature_id") < 200), zoom=3)
        b = points_to_vector_tiles(points.filter(F.col("feature_id") >= 200), zoom=3)
        merged = merge_vector_payloads([a, b]).cache()
        total = 0
        for r in merged.collect():
            for layer in decode_vector_tile(bytes(r.bytes)):
                total += len(layer["features"])
        assert total == 400


class TestPayloadPropertyOps:
    @pytest.fixture(scope="class")
    def tiles(self, spark):
        from versatiles_rs_spark.udfs import derived_lat_expr, derived_lon_expr

        pts = spark.range(0, 100).select(
            F.col("id").alias("feature_id"),
            derived_lon_expr(F.col("id")).alias("lon"),
            derived_lat_expr(F.col("id")).alias("lat"),
            F.create_map(
                F.lit("city_id"), (F.col("id") % 3).cast("string"),
                F.lit("kind"), F.lit("poi"),
            ).alias("props"),
        )
        return points_to_vector_tiles(pts, zoom=2)

    def test_filter_properties_drop(self, spark, tiles):
        from versatiles_rs_spark.vector_tile import filter_properties_payload

        out = filter_properties_payload(tiles, r"points/kind")
        for r in out.collect():
            for layer in decode_vector_tile(bytes(r.bytes)):
                for f in layer["features"]:
                    assert "kind" not in f["props"] and "city_id" in f["props"]

    def test_filter_properties_invert_keeps_only_matches(self, spark, tiles):
        from versatiles_rs_spark.vector_tile import filter_properties_payload

        out = filter_properties_payload(tiles, r"points/kind", invert=True)
        for r in out.collect():
            for layer in decode_vector_tile(bytes(r.bytes)):
                for f in layer["features"]:
                    assert set(f["props"]) == {"kind"}

    def test_update_properties_merge_and_inner(self, spark, tiles):
        """The berlin.vpl cities.csv join shape: city_id -> population."""
        from versatiles_rs_spark.vector_tile import update_properties_payload

        props = {"0": {"population": "1000"}, "1": {"population": "2000"}}
        merged = update_properties_payload(tiles, props, id_field="city_id")
        n_all = n_pop = 0
        for r in merged.collect():
            for layer in decode_vector_tile(bytes(r.bytes)):
                for f in layer["features"]:
                    n_all += 1
                    if "population" in f["props"]:
                        n_pop += 1
                        assert f["props"]["kind"] == "poi"  # merge keeps old keys
        assert n_all == 100 and n_pop == 67  # ids with id%3 in (0,1)

        inner = update_properties_payload(
            tiles, props, id_field="city_id", remove_non_matching=True,
            replace_properties=True,
        )
        n_in = 0
        for r in inner.collect():
            for layer in decode_vector_tile(bytes(r.bytes)):
                for f in layer["features"]:
                    n_in += 1
                    assert set(f["props"]) == {"population"}  # replaced
        assert n_in == 67


class TestGeometryProperties:
    """Hypothesis: codec round-trips over arbitrary integer geometry."""

    def test_random_geometry_roundtrips(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        coord = st.tuples(
            st.integers(min_value=-100000, max_value=100000),
            st.integers(min_value=-100000, max_value=100000),
        )

        @settings(max_examples=200, deadline=None)
        @given(
            gtype=st.sampled_from([POINT, LINESTRING]),
            parts=st.lists(st.lists(coord, min_size=1, max_size=12), min_size=1, max_size=4),
        )
        def check(gtype, parts):
            if gtype == LINESTRING:
                parts = [p for p in parts if len(p) >= 2] or [[(0, 0), (1, 1)]]
            dec = decode_geometry(encode_geometry(parts, gtype), gtype)
            if gtype == POINT:
                flat = [(p,) for part in parts for p in part]
                assert [tuple(d) for d in dec] == [list(f) for f in flat] or dec == [
                    [p] for part in parts for p in part
                ]
            else:
                assert dec == [list(p) for p in parts]

        check()

    def test_random_polygons_roundtrip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        coord = st.tuples(
            st.integers(min_value=-50000, max_value=50000),
            st.integers(min_value=-50000, max_value=50000),
        )

        @settings(max_examples=200, deadline=None)
        @given(rings=st.lists(st.lists(coord, min_size=3, max_size=10), min_size=1, max_size=3))
        def check(rings):
            closed = [r + [r[0]] for r in rings]
            dec = decode_geometry(encode_geometry(closed, POLYGON), POLYGON)
            assert dec == [list(r) for r in closed]

        check()
