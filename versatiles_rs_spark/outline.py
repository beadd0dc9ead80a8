"""Tile-set outline: union of tile squares into boundary polygons.

Parity: TileOutline (/root/reference/versatiles_geometry/src/tile_outline/
mod.rs:60-66) unions tile bboxes with the geo crate's `unary_union`. No
shapely in this environment, so the union is computed directly on the tile
grid — exact for this input class (axis-aligned unit squares):

1. boundary edges: a tile edge is on the outline iff the neighbor across it
   is not in the set; edges are DIRECTED so that covered area lies on the
   left (outer rings counter-clockwise in tile space, holes clockwise);
2. ring chaining: walk edge-to-edge from any unused edge; at 4-corner pinch
   points (diagonal tiles) prefer the left-most turn so touching rings stay
   separate and orientation is preserved;
3. collinear merge + tile->lon/lat conversion of the vertices.

Driver-side for moderate sets (an outline is O(perimeter)); for huge sets,
group per coarse parent cell and stitch (each group's rings are independent
except at group borders — run at the parent level instead).
"""

from __future__ import annotations

import numpy as np

from . import tile_math as tm

# directed edges, area on the LEFT: right edge goes up, top goes left, etc.
# grid y grows downward (tile y), so "up" means decreasing y.
# For tile (x, y) with corners (x, y)..(x+1, y+1):
#   S neighbor (x, y+1) missing -> edge (x, y+1) -> (x+1, y+1)   (east, area north of it = left)
#   E neighbor (x+1, y) missing -> edge (x+1, y+1) -> (x+1, y)   (north)
#   N neighbor (x, y-1) missing -> edge (x+1, y) -> (x, y)       (west)
#   W neighbor (x-1, y) missing -> edge (x, y) -> (x, y+1)       (south)
_DIRS = {
    "S": ((0, 1), (0, 1), (1, 1)),
    "E": ((1, 0), (1, 1), (1, 0)),
    "N": ((0, -1), (1, 0), (0, 0)),
    "W": ((-1, 0), (0, 0), (0, 1)),
}
# left-turn preference per incoming direction vector -> ordered candidate
# outgoing directions (left, straight, right, back)
_VEC = {(1, 0): "E+", (-1, 0): "W-", (0, 1): "S+", (0, -1): "N-"}


def tile_outline_rings(xs, ys) -> list[list[tuple[int, int]]]:
    """Rings (closed, first == last) in tile-corner integer coordinates.
    Outer rings traverse with covered area on the left, which is CCW
    geographically (positive ring_signed_area); holes come out negative."""
    tiles = set(zip(map(int, np.atleast_1d(xs)), map(int, np.atleast_1d(ys))))
    if not tiles:
        return []
    # collect directed boundary edges: start -> end
    directed = []
    for x, y in tiles:
        for d, ((dx, dy), (sx, sy), (ex, ey)) in _DIRS.items():
            if (x + dx, y + dy) not in tiles:
                directed.append(((x + sx, y + sy), (x + ex, y + ey)))
    return rings_from_edges(directed)


def rings_from_edges(directed: list[tuple[tuple[int, int], tuple[int, int]]]):
    """Chain a directed boundary-edge list (start, end) into closed rings.

    Deterministic regardless of input order: edges are sorted, and each ring
    starts at the smallest vertex that is NOT a pinch point (single outgoing
    edge) so the left-turn rule alone decides every pinch traversal. This is
    the driver-side tail of the DISTRIBUTED outline: boundary edges come from
    a groupBy cancellation (see boundary_edges_df), the O(perimeter) chain
    runs here."""
    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for start, end in sorted(directed):
        edges.setdefault(start, []).append(end)
    rings = []
    while edges:
        start = min(
            (k for k, v in edges.items() if len(v) == 1), default=min(edges)
        )
        ring = [start]
        cur = start
        prev_vec = None
        while True:
            outs = edges.get(cur)
            if not outs:
                raise RuntimeError(f"open boundary at {cur}")
            if len(outs) == 1 or prev_vec is None:
                nxt = outs[0]
            else:
                # pinch point: prefer the sharpest left turn relative to the
                # incoming direction (keeps rings simple and consistent)
                def turn_key(cand):
                    vx, vy = cand[0] - cur[0], cand[1] - cur[1]
                    px, py = prev_vec
                    cross = px * vy - py * vx
                    dot = px * vx + py * vy
                    return np.arctan2(cross, dot)

                nxt = min(outs, key=turn_key)
            outs.remove(nxt)
            if not outs:
                del edges[cur]
            prev_vec = (nxt[0] - cur[0], nxt[1] - cur[1])
            if nxt == start:
                ring.append(start)
                break
            ring.append(nxt)
            cur = nxt
        rings.append(_merge_collinear(ring))
    return rings


def boundary_edges_df(tiles, x: str = "x", y: str = "y"):
    """DISTRIBUTED boundary-edge extraction (VERDICT r1 #4): every tile emits
    its 4 directed edges (area-on-the-left convention, _DIRS); an interior
    edge is emitted by BOTH adjacent tiles in opposite directions, so
    grouping by the undirected key and keeping count==1 leaves exactly the
    boundary — one groupBy over slim integer rows, no tile-set collect.
    Returns a DataFrame (sx, sy, ex, ey) of directed boundary edges,
    O(perimeter) rows — chain with rings_from_edges on the driver."""
    from pyspark.sql import functions as F

    xc, yc = F.col(x), F.col(y)
    one = F.lit(1)
    edges = F.array(
        F.struct(xc.alias("sx"), (yc + one).alias("sy"), (xc + one).alias("ex"), (yc + one).alias("ey")),
        F.struct((xc + one).alias("sx"), (yc + one).alias("sy"), (xc + one).alias("ex"), yc.alias("ey")),
        F.struct((xc + one).alias("sx"), yc.alias("sy"), xc.alias("ex"), yc.alias("ey")),
        F.struct(xc.alias("sx"), yc.alias("sy"), xc.alias("ex"), (yc + one).alias("ey")),
    )
    e = (
        tiles.select(xc.alias(x), yc.alias(y)).distinct()
        .select(F.explode(edges).alias("e"))
        .select("e.sx", "e.sy", "e.ex", "e.ey")
    )
    fwd = (F.col("sx") < F.col("ex")) | (
        (F.col("sx") == F.col("ex")) & (F.col("sy") < F.col("ey"))
    )
    keyed = e.select(
        "sx", "sy", "ex", "ey",
        F.when(fwd, F.col("sx")).otherwise(F.col("ex")).alias("k0x"),
        F.when(fwd, F.col("sy")).otherwise(F.col("ey")).alias("k0y"),
        F.when(fwd, F.col("ex")).otherwise(F.col("sx")).alias("k1x"),
        F.when(fwd, F.col("ey")).otherwise(F.col("sy")).alias("k1y"),
    )
    return (
        keyed.groupBy("k0x", "k0y", "k1x", "k1y")
        .agg(
            F.count("*").alias("n"),
            F.min("sx").alias("sx"), F.min("sy").alias("sy"),
            F.min("ex").alias("ex"), F.min("ey").alias("ey"),
        )
        .filter(F.col("n") == 1)
        .select("sx", "sy", "ex", "ey")
    )


def _merge_collinear(ring: list[tuple[int, int]]) -> list[tuple[int, int]]:
    pts = ring[:-1]  # drop duplicated closing vertex for circular indexing
    n = len(pts)
    out = []
    for i in range(n):
        a, b, c = pts[i - 1], pts[i], pts[(i + 1) % n]
        if (b[0] - a[0]) * (c[1] - b[1]) != (b[1] - a[1]) * (c[0] - b[0]):
            out.append(b)
    return out + [out[0]]


def ring_signed_area(ring) -> float:
    """Signed area with the GEOGRAPHIC convention: tile-y grows southward, so
    the shoelace sign is negated — outer rings positive (CCW on a map),
    holes negative."""
    a = 0.0
    for (x0, y0), (x1, y1) in zip(ring[:-1], ring[1:]):
        a += x0 * y1 - x1 * y0
    return -a / 2.0


def tile_outline_geo(z: int, xs, ys) -> list[list[tuple[float, float]]]:
    """Outline rings in WGS84 lon/lat (tile corners via tile_to_lonlat)."""
    out = []
    for ring in tile_outline_rings(xs, ys):
        rx = np.array([p[0] for p in ring], dtype=np.int64)
        ry = np.array([p[1] for p in ring], dtype=np.int64)
        lon, lat = tm.tile_to_lonlat(z, rx, ry)
        out.append(list(zip(map(float, lon), map(float, lat))))
    return out


def tile_outline_feature(z: int, xs, ys) -> dict:
    """GeoJSON Feature (Polygon/MultiPolygon) — TileOutline::to_feature
    analog. Holes grouped with their containing outer ring by orientation
    (positive signed area in tile coords = outer, y-down convention)."""
    rings = tile_outline_rings(xs, ys)
    outers, holes = [], []
    for ring in rings:
        (outers if ring_signed_area(ring) > 0 else holes).append(ring)
    assert outers, "no outer ring found"

    def to_geo(ring):
        rx = np.array([p[0] for p in ring], dtype=np.int64)
        ry = np.array([p[1] for p in ring], dtype=np.int64)
        lon, lat = tm.tile_to_lonlat(z, rx, ry)
        return [[float(a), float(b)] for a, b in zip(lon, lat)]

    def contains(outer, pt) -> bool:
        # point-in-ring in tile coords (crossing number)
        x, y = pt
        inside = False
        for (x0, y0), (x1, y1) in zip(outer[:-1], outer[1:]):
            if (y0 > y) != (y1 > y) and x < (x1 - x0) * (y - y0) / (y1 - y0) + x0:
                inside = not inside
        return inside

    polys = []
    for outer in outers:
        poly = [to_geo(outer)]
        for hole in holes:
            if contains(outer, hole[0]):
                poly.append(to_geo(hole))
        polys.append(poly)
    if len(polys) == 1:
        geometry = {"type": "Polygon", "coordinates": polys[0]}
    else:
        geometry = {"type": "MultiPolygon", "coordinates": polys}
    return {"type": "Feature", "geometry": geometry, "properties": {"zoom": int(z)}}
