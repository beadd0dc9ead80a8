"""VPL (VersaTiles Pipeline Language) parser + planner.

Grammar (reference: /root/reference/versatiles_pipeline/src/vpl/parser.rs:18-120,
syntax docs versatiles_pipeline/README.md:13-38):

    pipeline := operation ("|" operation)*
    operation := NAME (NAME "=" value)* [ "[" pipeline ("," pipeline)* "]" ]
    value := quoted string | bare token (number/bool/word)

A pipeline is a head read op ("from_*") followed by transform ops; read ops
that combine sources carry child pipelines in brackets. Our planner
(`build_pipeline`) folds the node list into a DataFrame: head nodes come from
SOURCE_FACTORIES, transforms from TRANSFORM_FACTORIES — the Spark counterpart
of PipelineFactory::build_pipeline (factory.rs:146-157). Catalyst then does
the optimization the reference pre-computes by hand (bbox/zoom pushdown).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class VPLNode:
    name: str
    params: dict = field(default_factory=dict)
    children: list["VPLPipeline"] = field(default_factory=list)


@dataclass
class VPLPipeline:
    nodes: list[VPLNode]


class VPLParseError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str):
        self.s = text
        self.i = 0

    def error(self, msg: str) -> VPLParseError:
        line = self.s[: self.i].count("\n") + 1
        return VPLParseError(f"{msg} at line {line} (offset {self.i})")

    def ws(self):
        while self.i < len(self.s):
            c = self.s[self.i]
            if c in " \t\r\n":
                self.i += 1
            elif c == "#":  # comment to end of line
                while self.i < len(self.s) and self.s[self.i] != "\n":
                    self.i += 1
            else:
                break

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def ident(self) -> str:
        start = self.i
        while self.i < len(self.s) and (self.s[self.i].isalnum() or self.s[self.i] in "_-."):
            self.i += 1
        if self.i == start:
            raise self.error(f"expected identifier, found {self.peek()!r}")
        return self.s[start : self.i]

    def value(self):
        if self.peek() == '"':
            self.i += 1
            out = []
            while True:
                if self.i >= len(self.s):
                    raise self.error("unterminated string")
                c = self.s[self.i]
                self.i += 1
                if c == "\\":
                    out.append(self.s[self.i])
                    self.i += 1
                elif c == '"':
                    break
                else:
                    out.append(c)
            return "".join(out)
        raw = self.ident()
        low = raw.lower()
        if low in ("true", "false"):
            return low == "true"
        try:
            return int(raw)
        except ValueError:
            pass
        try:
            return float(raw)
        except ValueError:
            return raw

    def operation(self) -> VPLNode:
        self.ws()
        node = VPLNode(self.ident())
        while True:
            self.ws()
            c = self.peek()
            if c == "[":
                self.i += 1
                while True:
                    node.children.append(self.pipeline(stop={",", "]"}))
                    self.ws()
                    if self.peek() == ",":
                        self.i += 1
                        continue
                    if self.peek() == "]":
                        self.i += 1
                        break
                    raise self.error("expected ',' or ']' in source list")
                continue
            if not c or c in "|,]":
                return node
            # parameter
            key = self.ident()
            self.ws()
            if self.peek() != "=":
                raise self.error(f"expected '=' after parameter {key!r}")
            self.i += 1
            self.ws()
            node.params[key] = self.value()

    def pipeline(self, stop: set[str] = frozenset()) -> VPLPipeline:
        nodes = [self.operation()]
        while True:
            self.ws()
            if self.peek() == "|":
                self.i += 1
                nodes.append(self.operation())
            else:
                break
        return VPLPipeline(nodes)


def parse_vpl(text: str) -> VPLPipeline:
    p = _Parser(text)
    pipe = p.pipeline()
    p.ws()
    if p.i < len(p.s):
        raise p.error(f"trailing input {p.s[p.i:p.i+20]!r}")
    if not pipe.nodes[0].name.startswith("from_"):
        raise VPLParseError(f"pipeline must start with a read op, got {pipe.nodes[0].name!r}")
    return pipe


# ---------------------------------------------------------------------------
# planner: VPL tree -> DataFrame
# ---------------------------------------------------------------------------

SOURCE_FACTORIES: dict = {}
TRANSFORM_FACTORIES: dict = {}


def source(name: str):
    def deco(fn):
        SOURCE_FACTORIES[name] = fn
        return fn

    return deco


def transform(name: str):
    def deco(fn):
        TRANSFORM_FACTORIES[name] = fn
        return fn

    return deco


def build_pipeline(spark: SparkSession, pipe: VPLPipeline) -> DataFrame:
    """Fold head + transforms into a DataFrame (factory.rs:146-157)."""
    head, *tail = pipe.nodes
    if head.name not in SOURCE_FACTORIES:
        raise VPLParseError(f"unknown read operation {head.name!r}")
    children = [build_pipeline(spark, c) for c in head.children]
    df = SOURCE_FACTORIES[head.name](spark, children=children, **head.params)
    for node in tail:
        if node.name not in TRANSFORM_FACTORIES:
            raise VPLParseError(f"unknown transform operation {node.name!r}")
        if node.children:
            raise VPLParseError(f"transform {node.name!r} cannot take source lists")
        prev = df
        df = TRANSFORM_FACTORIES[node.name](df, **node.params)
        # Thread the TileJSON sidecar through: transforms return NEW DataFrame
        # objects, which would silently drop meta_update's attribute.
        if df is not prev and hasattr(prev, "_vt_meta") and not hasattr(df, "_vt_meta"):
            df._vt_meta = prev._vt_meta
    return df


def run_vpl(spark: SparkSession, text: str, base_dir: str | None = None) -> DataFrame:
    """Parse + build a VPL pipeline. `base_dir` anchors relative filenames
    (from_container / data_source_path), like the reference resolves against
    the VPL file's directory."""
    prev = _VPL_BASE_DIR[0]
    _VPL_BASE_DIR[0] = base_dir
    try:
        return build_pipeline(spark, parse_vpl(text))
    finally:
        _VPL_BASE_DIR[0] = prev


def run_vpl_file(spark: SparkSession, path: str) -> DataFrame:
    """Run a .vpl file; relative paths resolve against the file's directory."""
    import os

    with open(path) as f:
        text = f.read()
    return run_vpl(spark, text, base_dir=os.path.dirname(os.path.abspath(path)))


# ---------------------------------------------------------------------------
# built-in factories (registered against the engine's operators)
# ---------------------------------------------------------------------------


@source("from_debug")
def _from_debug(spark, children=(), format: str = "png", n: int = 256, zoom: int = 4, **kw):
    """Deterministic debug tile source (from_debug/mod.rs:31-120): synthetic
    images + derived tile coords — the test-fixture factory."""
    from .. import fixtures

    df = fixtures.images_with_tiles_df(
        spark, int(n), size=int(kw.get("tile_size", 16)), zoom=int(zoom),
        partitions=4, skew=False, target_fmt=format,
    )
    return df


@source("from_parquet")
def _from_parquet(spark, children=(), filename: str = "", **kw):
    """Scan an existing tile table (pushdown-friendly parquet path)."""
    return spark.read.parquet(_resolve(filename))


# base directory for relative filenames inside a VPL file — the reference
# resolves from_container/data_source_path against the VPL file's own
# location (from_container.rs:20-22). Set by run_vpl(..., base_dir=).
_VPL_BASE_DIR: list = [None]


def _resolve(path: str) -> str:
    import os

    if _VPL_BASE_DIR[0] and not os.path.isabs(path) and "://" not in path:
        return os.path.join(_VPL_BASE_DIR[0], path)
    return path


@source("from_container")
def _from_container(spark, children=(), filename: str = "", **kw):
    """Container dispatch by extension (from_container.rs + the
    container_registry): mbtiles / pmtiles / versatiles / tar / parquet /
    directory tree; pmtiles + versatiles also read from http(s):// URLs."""
    f = _resolve(str(filename))
    if f.endswith(".mbtiles"):
        from ..sources.mbtiles import read_mbtiles

        return read_mbtiles(spark, f)
    if f.endswith(".pmtiles"):
        from ..sources.pmtiles import read_pmtiles

        return read_pmtiles(spark, f)
    if f.endswith(".versatiles"):
        from ..sources.versatiles import read_versatiles

        return read_versatiles(spark, f)
    if f.endswith(".tar"):
        from ..sources.tar import read_tar

        return read_tar(spark, f)
    if f.endswith(".parquet") or f.endswith("/"):
        return spark.read.parquet(f)
    import os

    if os.path.isdir(f):
        from ..sources.containers import read_directory_tree

        return read_directory_tree(spark, f)
    raise VPLParseError(f"from_container: unrecognized container {filename!r}")


@source("from_gdal_raster")
def _from_gdal_raster(
    spark, children=(), filename: str = "", tile_size=256, level_min=0, level_max=3, **kw
):
    """Georeferenced raster -> tile pyramid (from_gdal/raster/operation.rs;
    the reference gates this behind its gdal feature flag). GeoTIFF decode is
    real here (system libtiff); the reference's own test pipeline
    `from_gdal_raster filename="../testdata/gradient.tif" ...` runs as-is."""
    from ..sources.raster import open_raster, raster_to_tiles

    raster = open_raster(_resolve(str(filename)))
    return raster_to_tiles(
        spark, raster, int(level_min), int(level_max), tile_size=int(tile_size)
    )


@source("from_stacked")
def _from_stacked(spark, children=(), **kw):
    from ..operators.stacked import stacked_first_non_empty

    return stacked_first_non_empty(list(children), payload=kw.get("payload", "bytes"))


@source("from_stacked_raster")
def _from_stacked_raster(spark, children=(), format: str = "png", **kw):
    from ..operators.stacked import stacked_raster_blend

    return stacked_raster_blend(
        list(children), fmt=format, tile_size=int(kw.get("tile_size", 16))
    )


# reference alias (versatiles_pipeline/README.md "from_overlayed")
SOURCE_FACTORIES["from_overlayed"] = _from_stacked


@source("from_mvt_debug")
def _from_mvt_debug(spark, children=(), n: int = 64, zoom: int = 2, **kw):
    """Vector-payload debug source — the from_debug format="mvt" analog
    (from_debug/vector.rs:17): synthetic points grouped into MVT-style tiles."""
    from pyspark.sql import functions as F

    from ..udfs import derived_lat_expr, derived_lon_expr
    from ..vector_tile import points_to_vector_tiles

    pts = spark.range(0, int(n)).select(
        F.col("id").alias("feature_id"),
        derived_lon_expr(F.col("id")).alias("lon"),
        derived_lat_expr(F.col("id")).alias("lat"),
        F.create_map(F.lit("i"), F.col("id").cast("string")).alias("props"),
    )
    return points_to_vector_tiles(pts, zoom=int(zoom))


@source("from_merged_vector")
def _from_merged_vector(spark, children=(), **kw):
    from ..vector_tile import merge_vector_payloads

    return merge_vector_payloads(list(children))


@source("from_directory")
def _from_directory(spark, children=(), path: str = "", **kw):
    from ..sources.containers import read_directory_tree

    return read_directory_tree(spark, path)


@transform("filter_zoom")
def _filter_zoom(df, min: int = 0, max: int = 31, **kw):
    from ..operators.filter import filter_zoom

    return filter_zoom(df, level_min=int(min), level_max=int(max))


@transform("filter_bbox")
def _filter_bbox(df, x_min=-180.0, y_min=-85.0, x_max=180.0, y_max=85.0, zoom=None, **kw):
    from ..operators.filter import filter_geo_bbox

    if zoom is None:
        raise VPLParseError("filter_bbox requires zoom=<z> (tile-range compilation level)")
    return filter_geo_bbox(
        df, (float(x_min), float(y_min), float(x_max), float(y_max)), zoom=int(zoom)
    )


@transform("raster_levels")
def _raster_levels(df, brightness=0.0, contrast=255.0, gamma=1.0, **kw):
    from ..operators.raster import raster_levels

    return raster_levels(df, brightness=float(brightness), contrast=float(contrast), gamma=float(gamma))


@transform("raster_flatten")
def _raster_flatten(df, color="255,255,255", **kw):
    from ..operators.raster import raster_flatten

    c = tuple(int(v) for v in str(color).split(",")) if isinstance(color, str) else (255, 255, 255)
    return raster_flatten(df, color=c)


@transform("raster_hillshade")
def _raster_hillshade(df, dem_schema="mapbox", azimuth="315", altitude="45",
                      cellsize="1.0", multidirectional="false", **kw):
    """Engine extension (not in the reference's VPL): DEM tiles -> Horn
    hillshade tiles in the pipeline language; multidirectional=true
    switches to the Mark 1992 four-lamp MDOW blend (gdaldem
    -multidirectional)."""
    from ..operators.raster import dem_hillshade

    return dem_hillshade(
        df, schema=dem_schema, azimuth_deg=float(azimuth),
        altitude_deg=float(altitude), cellsize=float(cellsize),
        multidirectional=multidirectional.lower() == "true",
    )


@transform("raster_colorrelief")
def _raster_colorrelief(df, color_table="0:0,0,255;128:0,255,0;255:255,255,255",
                        dem_schema="mapbox", **kw):
    """Engine extension: gdaldem color-relief in the pipeline language.
    `color_table` is "elev:r,g,b;elev:r,g,b;..." ascending stops; linear
    interpolation between stops, clamped outside (gdaldem defaults)."""
    from ..operators.raster import dem_color_relief

    stops = []
    for part in str(color_table).split(";"):
        part = part.strip()
        if not part:
            continue
        v, rgb = part.split(":")
        r, g, b = (int(c) for c in rgb.split(","))
        stops.append((float(v), r, g, b))
    return dem_color_relief(df, stops, schema=dem_schema)


@transform("raster_fill")
def _raster_fill(df, tile_size="256", super_tiles="1", zoom=None, **kw):
    """Engine extension: Priority-Flood depression filling in the
    pipeline language — DEM tiles in, hydrologically conditioned DEM
    tiles out (chain `raster_fill | raster_flowaccum` for the full
    fill-then-flow pipeline)."""
    from pyspark.sql import functions as F

    from ..operators.hydro import fill_depressions

    z = int(zoom) if zoom is not None else df.agg(F.max("z")).first()[0]
    tiles = df.filter(F.col("z") == z).select("x", "y", "bytes")
    out = fill_depressions(
        tiles, tile_size=int(tile_size), super_tiles=int(super_tiles), emit="tiles"
    )
    return out.select(F.lit(z).cast("long").alias("z"), "x", "y", "bytes", "fmt")


@transform("raster_flowaccum")
def _raster_flowaccum(df, tile_size="256", super_tiles="1", zoom=None, **kw):
    """Engine extension (not in the reference's VPL): DEM tiles -> flow
    accumulation rendered as log2-ramp grayscale tiles, in the pipeline
    language.  Single-zoom: `zoom` picks the level (default: the source's
    max zoom)."""
    from pyspark.sql import functions as F

    from ..operators.hydro import accumulation_to_tiles, flow_accumulation

    z = int(zoom) if zoom is not None else df.agg(F.max("z")).first()[0]
    tiles = df.filter(F.col("z") == z).select("x", "y", "bytes")
    acc = flow_accumulation(
        tiles, tile_size=int(tile_size), super_tiles=int(super_tiles)
    )
    out = accumulation_to_tiles(acc, tile_size=int(tile_size))
    return out.select(F.lit(z).cast("long").alias("z"), "x", "y", "bytes", "fmt")


@transform("raster_costdist")
def _raster_costdist(df, sources="256,256", tile_size="256", super_tiles="1",
                     blocked=None, zoom=None, **kw):
    """Engine extension: cost raster tiles -> cost-distance surface
    rendered as log2-ramp grayscale tiles in the pipeline language (the
    GRASS r.cost operator as a VPL stage; unreachable cells render 0).
    `sources` is a semicolon-separated gx,gy list."""
    from pyspark.sql import functions as F

    from ..operators.costdist import cost_distance
    from ..operators.hydro import accumulation_to_tiles

    z = int(zoom) if zoom is not None else df.agg(F.max("z")).first()[0]
    tiles = df.filter(F.col("z") == z).select("x", "y", "bytes")
    srcs = [tuple(map(int, p.split(","))) for p in str(sources).split(";") if p]
    cd = cost_distance(
        tiles, srcs, tile_size=int(tile_size), super_tiles=int(super_tiles),
        blocked=None if blocked is None else int(blocked),
    )
    out = accumulation_to_tiles(
        cd.filter(F.col("dist") >= 0).select("gx", "gy", F.col("dist").alias("acc")),
        tile_size=int(tile_size),
    )
    return out.select(F.lit(z).cast("long").alias("z"), "x", "y", "bytes", "fmt")


@transform("raster_viewshed")
def _raster_viewshed(df, observers="256,256", radius="48", height="2",
                     tile_size="256", zoom=None, **kw):
    """Engine extension: DEM tiles -> viewshed mask tiles (255 = visible
    from any observer, 64 = inside a window but hidden, 0 = outside all
    windows) in the pipeline language — the integer-exact R3 viewshed as
    a VPL stage.  `observers` is a semicolon-separated gx,gy list."""
    from pyspark.sql import functions as F

    from ..operators.hydro import accumulation_to_tiles
    from ..operators.viewshed import viewshed

    z = int(zoom) if zoom is not None else df.agg(F.max("z")).first()[0]
    tiles = df.filter(F.col("z") == z).select("x", "y", "bytes")
    obs = [
        (i + 1, *map(int, p.split(",")))
        for i, p in enumerate(str(observers).split(";"))
        if p
    ]
    vis = viewshed(
        tiles, obs, radius=int(radius), height=int(height),
        tile_size=int(tile_size),
    )
    # collapse overlapping windows (visible from ANY observer wins),
    # then pick values whose log2 ramp lands on the documented levels:
    # bit_length(2^16-1) = 16 -> clamped 255; bit_length(15) = 4 -> 64
    lvl = (
        vis.groupBy("gx", "gy")
        .agg(F.max("visible").alias("v"))
        .select(
            "gx", "gy",
            F.when(F.col("v") > 0, F.lit((1 << 16) - 1))
            .otherwise(F.lit(15)).alias("acc"),
        )
    )
    out = accumulation_to_tiles(lvl, tile_size=int(tile_size))
    return out.select(F.lit(z).cast("long").alias("z"), "x", "y", "bytes", "fmt")


@transform("raster_shadow")
def _raster_shadow(df, azimuth="W", altitude="30", tile_size="256",
                   super_tiles="1", zoom=None, **kw):
    """Engine extension: DEM tiles -> cast-shadow mask tiles (255 = lit,
    64 = shadowed) for a cardinal sun azimuth — a cell is shadowed iff
    its fixed-point horizon tangent toward the sun exceeds
    floor(tan(altitude) * 2^16), the gdaldem-shadow rule on the
    hull-merge horizon operator."""
    import math

    from pyspark.sql import functions as F

    from ..operators.horizon import SCALE, horizon_angle
    from ..operators.hydro import accumulation_to_tiles

    z = int(zoom) if zoom is not None else df.agg(F.max("z")).first()[0]
    tiles = df.filter(F.col("z") == z).select("x", "y", "bytes")
    thr = int(math.tan(math.radians(float(altitude))) * SCALE)
    h = horizon_angle(
        tiles, tile_size=int(tile_size), super_tiles=int(super_tiles),
        direction=str(azimuth),
    )
    lvl = h.select(
        "gx", "gy",
        F.when(F.col("horizon") > thr, F.lit(15))      # bit_length 4 -> 64
        .otherwise(F.lit((1 << 16) - 1)).alias("acc"),  # -> 255
    )
    out = accumulation_to_tiles(lvl, tile_size=int(tile_size))
    return out.select(F.lit(z).cast("long").alias("z"), "x", "y", "bytes", "fmt")


@transform("raster_calc")
def _raster_calc(df, expr="a", tile_size="256", **kw):
    """Engine extension: per-pixel map algebra in the pipeline language
    (the gdal_calc analog) — `expr` is evaluated per tile with numpy
    semantics over a restricted namespace: `a` is the tile's first band
    as float64, plus abs/minimum/maximum/sqrt/log2/clip/where and
    numeric literals.  The result clips to uint8.  One fused Arrow pass,
    no shuffle."""
    import numpy as np
    import pandas as pd

    from ..codecs import decode_image, encode_png

    allowed = {
        "abs": np.abs, "minimum": np.minimum, "maximum": np.maximum,
        "sqrt": np.sqrt, "log2": np.log2, "clip": np.clip,
        "where": np.where, "floor": np.floor,
    }
    code = compile(str(expr), "<raster_calc>", "eval")
    for name in code.co_names:
        if name not in allowed and name != "a":
            raise ValueError(f"raster_calc: name {name!r} not allowed")

    def run(batches):
        for pdf in batches:
            rows = []
            for z, x, y, blob in zip(pdf["z"], pdf["x"], pdf["y"], pdf["bytes"]):
                a = decode_image(bytes(blob))[..., 0].astype(np.float64)
                v = eval(code, {"__builtins__": {}}, {**allowed, "a": a})
                v = np.clip(np.asarray(v, dtype=np.float64), 0, 255)
                rows.append(
                    (int(z), int(x), int(y),
                     encode_png(v.astype(np.uint8)[:, :, None]), "png")
                )
            yield pd.DataFrame(
                rows, columns=["z", "x", "y", "bytes", "fmt"]
            )

    return df.select("z", "x", "y", "bytes").mapInPandas(
        run, schema="z long, x long, y long, bytes binary, fmt string"
    )


@transform("raster_format")
def _raster_format(df, format: str = "png", quality="85", **kw):
    from ..operators.raster import raster_format

    return raster_format(df, target_fmt=format, quality=quality)


@transform("raster_palette")
def _raster_palette(df, colors="256", **kw):
    """Engine extension: palette-PNG8 quantization (pngquant analog) in
    the pipeline language."""
    from ..operators.raster import raster_palette

    return raster_palette(df, n_colors=int(colors))


@transform("flip_y")
def _flip_y(df, **kw):
    from ..operators.transform import flip_y_df

    return flip_y_df(df)


@transform("swap_xy")
def _swap_xy(df, **kw):
    from ..operators.transform import swap_xy_df

    return swap_xy_df(df)


@transform("vector_filter_properties")
def _vector_filter_properties(df, regex: str = "", invert=False, **kw):
    """Drop (or with invert, keep) feature properties whose 'layer/name'
    path matches the regex (vector_filter_properties.rs:16-25)."""
    from ..vector_tile import filter_properties_payload

    return filter_properties_payload(df, str(regex), invert=_to_bool(invert))


def _to_bool(v) -> bool:
    return str(v).lower() in ("1", "true", "yes") if not isinstance(v, bool) else v


@transform("vector_update_properties")
def _vector_update_properties(
    df,
    data_source_path: str = "",
    layer_name: str = "",
    id_field_tiles: str = "",
    id_field_data: str = "",
    replace_properties=False,
    remove_non_matching=False,
    include_id=False,
    **kw,
):
    """Join an external CSV into vector-tile feature properties
    (vector_update_properties.rs:17-37 args, incl. the reference's
    berlin.vpl). The CSV is loaded driver-side into the broadcast property
    map (the reference's HashMap pattern); payloads may be VTV1 or real MVT
    protobuf."""
    import csv

    from ..vector_tile import update_properties_payload

    path = _resolve(str(data_source_path))
    props_map: dict = {}
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            key = row.get(id_field_data)
            if key is None:
                raise VPLParseError(
                    f"vector_update_properties: {id_field_data!r} not in {path}"
                )
            vals = {k: v for k, v in row.items() if include_id or k != id_field_data}
            props_map[str(key)] = vals
    return update_properties_payload(
        df,
        props_map,
        id_field=id_field_tiles,
        remove_non_matching=_to_bool(remove_non_matching),
        replace_properties=_to_bool(replace_properties),
        layer_name=layer_name or None,
    )


@transform("vector_filter_layers")
def _vector_filter_layers(df, names: str = "", invert=False, **kw):
    from ..vector_tile import filter_layers_payload

    return filter_layers_payload(df, str(names).split(","), invert=bool(invert))


@transform("raster_overscale")
def _raster_overscale(df, from_zoom=None, to_zoom=None, **kw):
    from ..operators.raster import raster_overscale

    if from_zoom is None or to_zoom is None:
        raise VPLParseError("raster_overscale requires from_zoom= and to_zoom=")
    return raster_overscale(df, from_zoom=int(from_zoom), to_zoom=int(to_zoom))


@transform("raster_overview")
def _raster_overview(df, z_max=None, z_min: int = 0, tile_size: int = 16, **kw):
    """Full pyramid roll-up inside a VPL plan: emits the union of all levels
    (raster_overview.rs builds levels z_max-1..0 below the source)."""
    from ..operators.raster import build_pyramid

    if z_max is None:
        raise VPLParseError("raster_overview requires z_max= (source level)")
    levels = build_pyramid(
        df.select("z", "x", "y", "bytes", "fmt"), z_max=int(z_max), z_min=int(z_min),
        tile_size=int(tile_size),
    )
    out = None
    for _, lv in sorted(levels.items()):
        lv = lv.select("z", "x", "y", "bytes", "fmt")
        out = lv if out is None else out.unionByName(lv)
    return out


# TileJSON metadata updates (general/meta_update.rs): tilejson-spec fields
# attached as a plan-level sidecar dict, merged by sources.containers
# tilejson_for at sink time
META_FIELDS = ("attribution", "description", "fillzoom", "name", "schema")


@transform("meta_update")
def _meta_update(df, **kw):
    unknown = set(kw) - set(META_FIELDS)
    if unknown:
        raise VPLParseError(f"meta_update: unknown fields {sorted(unknown)}")
    meta = dict(getattr(df, "_vt_meta", {}))
    meta.update({k: v for k, v in kw.items() if k in META_FIELDS})
    df._vt_meta = meta
    return df


def tilejson_of(df) -> dict:
    """TileJSON for a pipeline output: coverage metadata + meta_update
    sidecar fields."""
    from ..sources.containers import tilejson_for

    tj = tilejson_for(df)
    tj.update(getattr(df, "_vt_meta", {}))
    return tj


@transform("raster_warp")
def _raster_warp(df, scale="3/2", offset_fp="0", out_tiles="2",
                 in_tiles="4", tile_size="256", **kw):
    """Engine extension: affine re-grid in the pipeline language (the
    gdalwarp stage of an ingest pipeline) — `scale` is a rational
    num/den applied to both axes, `offset_fp` a 1/256-px offset; the
    level's z is preserved.  Delegates to operators/warp.raster_warp
    (exact fixed-point bilinear, bounded tile gather)."""
    from pyspark.sql import functions as F

    from ..operators.warp import raster_warp

    num, den = (int(t) for t in str(scale).split("/"))
    it, ot, ts = int(in_tiles), int(out_tiles), int(tile_size)
    off = int(offset_fp)
    z = df.select(F.min("z")).first()[0]
    out = raster_warp(
        df.select("x", "y", "bytes"),
        in_tiles_x=it, in_tiles_y=it, out_tiles_x=ot, out_tiles_y=ot,
        num_x=num, den_x=den, off_x_fp=off,
        num_y=num, den_y=den, off_y_fp=off,
        tile_size=ts, emit="tiles",
    )
    return out.select(
        F.lit(z).cast("long").alias("z"), "x", "y", "bytes", "fmt"
    )
