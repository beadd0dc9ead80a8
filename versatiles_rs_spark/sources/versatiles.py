"""`.versatiles` container read/write — the reference's namesake format.

Parity (all in /root/reference/versatiles_container/src/container/versatiles/):
- file header (66 bytes, "versatiles_v02", BE):  types/file_header.rs:79-195
- block index (33-byte defs, brotli):            types/block_index.rs:38-53,
                                                 types/block_definition.rs:65-156
- per-block tile index (12-byte ranges, brotli): types/tile_index.rs:40-91
- 256x256 block grouping + small-blob dedup:     types/block_writer.rs:33-55
- layout [header | meta | blocks... | block_index]: writer.rs:8-19,80-215
- reader flow:                                   reader.rs:90-200

Brotli is REQUIRED by the format (block + tile indices); provided by
codecs.compress_blob/decompress_blob (system libbrotli via ctypes).

Like the pmtiles writer, this is a driver-side single-file EDGE format:
collect() is inherent (the reference is single-process here too). Size
guard below; for cluster-scale outputs use the partitioned sinks
(sinks/writers.py) and convert per shard.
"""

from __future__ import annotations

import json
import struct

from pyspark.sql import DataFrame, SparkSession

from ..codecs import compress_blob, decompress_blob

MAGIC = b"versatiles_v02"
HEADER_LEN = 66
BBOX_SCALE = 10000000.0
# file_header.rs:87-100
_FORMAT_CODE = {
    "bin": 0x00, "png": 0x10, "jpg": 0x11, "jpeg": 0x11, "webp": 0x12,
    "avif": 0x13, "svg": 0x14, "mvt": 0x20, "pbf": 0x20, "geojson": 0x21,
    "topojson": 0x22, "json": 0x23,
}
_FORMAT_NAME = {0x00: "bin", 0x10: "png", 0x11: "jpg", 0x12: "webp",
                0x13: "avif", 0x14: "svg", 0x20: "mvt", 0x21: "geojson",
                0x22: "topojson", 0x23: "json"}
_COMP_CODE = {"none": 0, None: 0, "uncompressed": 0, "gzip": 1, "brotli": 2}
_COMP_NAME = {0: "none", 1: "gzip", 2: "brotli"}

# writer.rs dedups blobs smaller than this via a content-hash lookup
_DEDUP_MAX = 1000
_MAX_DRIVER_TILES = 2_000_000


def _header_blob(fmt: str, compression: str, zooms, bbox, meta_range, blocks_range) -> bytes:
    out = bytearray(MAGIC)
    out.append(_FORMAT_CODE[fmt])
    out.append(_COMP_CODE[compression])
    out += bytes([zooms[0], zooms[1]])
    out += struct.pack(">iiii", *[int(round(v * BBOX_SCALE)) for v in bbox])
    out += struct.pack(">QQ", *meta_range)
    out += struct.pack(">QQ", *blocks_range)
    assert len(out) == HEADER_LEN
    return bytes(out)


def read_versatiles_header(path: str) -> dict:
    from ..remote import open_range_reader

    return parse_versatiles_header(open_range_reader(path).read(0, HEADER_LEN))


def parse_versatiles_header(buf: bytes) -> dict:
    if len(buf) != HEADER_LEN or buf[:14] != MAGIC:
        raise ValueError("not a versatiles_v02 file")
    fmt, comp, z0, z1 = buf[14], buf[15], buf[16], buf[17]
    bbox = struct.unpack_from(">iiii", buf, 18)
    meta_range = struct.unpack_from(">QQ", buf, 34)
    blocks_range = struct.unpack_from(">QQ", buf, 50)
    return {
        "tile_format": _FORMAT_NAME.get(fmt, "unknown"),
        "compression": _COMP_NAME.get(comp, "unknown"),
        "zoom_range": (z0, z1),
        "bbox": [v / BBOX_SCALE for v in bbox],
        "meta_range": meta_range,
        "blocks_range": blocks_range,
    }


def write_versatiles(
    df: DataFrame,
    path: str,
    metadata: dict | None = None,
    payload: str = "bytes",
    tile_type: str = "png",
    compression: str = "none",
) -> int:
    """Export a tile DataFrame as a `.versatiles` archive. Returns tiles
    written. Payload bytes are stored as-is; `compression` declares their
    codec (header field), matching the reference's pass-through behavior."""
    from .. import tile_math as tm

    rows = df.select("z", "x", "y", payload).collect()
    if len(rows) > _MAX_DRIVER_TILES:
        raise ValueError(
            f"write_versatiles collects to the driver; {len(rows)} tiles > "
            f"{_MAX_DRIVER_TILES}. Export partitioned (sinks/writers.py) instead."
        )
    if not rows:
        raise ValueError("no tiles to write")

    zmin = min(r.z for r in rows)
    zmax = max(r.z for r in rows)
    # geo bbox: union of per-zoom tile bboxes (bbox_pyramid.get_geo_bbox analog)
    import numpy as np

    lon_min = lat_min = 1e9
    lon_max = lat_max = -1e9
    for z in {r.z for r in rows}:
        xs = [r.x for r in rows if r.z == z]
        ys = [r.y for r in rows if r.z == z]
        w, s, _, _ = tm.tile_to_geo_bbox(z, min(xs), max(ys))
        _, _, e, n = tm.tile_to_geo_bbox(z, max(xs), min(ys))
        lon_min, lat_min = min(lon_min, w), min(lat_min, s)
        lon_max, lat_max = max(lon_max, e), max(lat_max, n)

    # group into 256x256 blocks per level (writer.rs:165)
    blocks: dict[tuple, list] = {}
    for r in rows:
        blocks.setdefault((int(r.z), int(r.x) // 256, int(r.y) // 256), []).append(r)

    meta = json.dumps(metadata or {"tilejson": "3.0.0"}, sort_keys=True).encode()
    meta_blob = compress_blob(meta, compression)

    out = bytearray(b"\x00" * HEADER_LEN)
    meta_range = (len(out), len(meta_blob))
    out += meta_blob

    index_entries = []
    n_written = 0
    for (z, bx, by) in sorted(blocks):
        tiles = blocks[(z, bx, by)]
        gx_min, gx_max = min(t.x for t in tiles), max(t.x for t in tiles)
        gy_min, gy_max = min(t.y for t in tiles), max(t.y for t in tiles)
        w = gx_max - gx_min + 1
        h = gy_max - gy_min + 1
        tiles_off = len(out)
        # per-tile relative ranges, row-major over the coverage bbox
        # (block_writer.rs:34 index_of; tile_index.rs TILE_INDEX_LENGTH=12)
        ranges = [(0, 0)] * (w * h)
        dedup: dict[bytes, tuple] = {}
        for t in tiles:
            blob = bytes(t[payload])
            idx = (int(t.y) - gy_min) * w + (int(t.x) - gx_min)
            if len(blob) < _DEDUP_MAX and blob in dedup:
                ranges[idx] = dedup[blob]
                continue
            rng = (len(out) - tiles_off, len(blob))
            out += blob
            ranges[idx] = rng
            if len(blob) < _DEDUP_MAX:
                dedup[blob] = rng
            n_written += 1
        tiles_len = len(out) - tiles_off
        tidx = b"".join(struct.pack(">QI", o, ln) for o, ln in ranges)
        tidx_blob = compress_blob(tidx, "brotli")
        out += tidx_blob
        # 33-byte block definition (block_definition.rs:135-156)
        index_entries.append(
            struct.pack(
                ">BIIBBBBQQI",
                z, bx, by,
                gx_min - bx * 256, gy_min - by * 256,
                gx_max - bx * 256, gy_max - by * 256,
                tiles_off, tiles_len, len(tidx_blob),
            )
        )

    block_index_blob = compress_blob(b"".join(index_entries), "brotli")
    blocks_range = (len(out), len(block_index_blob))
    out += block_index_blob

    out[:HEADER_LEN] = _header_blob(
        tile_type, compression, (zmin, zmax),
        (lon_min, lat_min, lon_max, lat_max), meta_range, blocks_range,
    )
    with open(path, "wb") as f:
        f.write(out)
    return len(rows)


def _iter_block_tiles(rd, entry: bytes):
    """Yield (z, x, y, blob) for one 33-byte block definition; two ranged
    reads per block (tile index + tiles segment)."""
    z, bx, by, x0, y0, x1, y1, tiles_off, tiles_len, idx_len = struct.unpack(
        ">BIIBBBBQQI", entry
    )
    tidx = decompress_blob(rd.read(tiles_off + tiles_len, idx_len), "brotli")
    tiles = rd.read(tiles_off, tiles_len)
    w = x1 - x0 + 1
    n = len(tidx) // 12
    for i in range(n):
        off, ln = struct.unpack_from(">QI", tidx, i * 12)
        if ln == 0:
            continue
        x = bx * 256 + x0 + i % w
        y = by * 256 + y0 + i // w
        yield z, x, y, tiles[off : off + ln]


def read_versatiles(spark: SparkSession, path: str) -> DataFrame:
    """Scan a .versatiles archive into an XYZ tile DataFrame (reader.rs flow:
    header -> brotli block index -> per-block brotli tile index -> ranges).
    `path` may be a local file or an http(s):// URL — remote archives read
    with ranged requests (data_reader_http.rs:91-98 parity)."""
    from ..remote import open_range_reader

    rd = open_range_reader(path)
    h = parse_versatiles_header(rd.read(0, HEADER_LEN))
    b0, bl = h["blocks_range"]
    bindex = decompress_blob(rd.read(b0, bl), "brotli")
    rows = []
    for i in range(len(bindex) // 33):
        rows.extend(_iter_block_tiles(rd, bindex[i * 33 : i * 33 + 33]))
    return spark.createDataFrame(rows, "z int, x long, y long, bytes binary")


def read_versatiles_metadata(path: str) -> dict:
    from ..remote import open_range_reader

    rd = open_range_reader(path)
    h = parse_versatiles_header(rd.read(0, HEADER_LEN))
    m0, ml = h["meta_range"]
    if ml == 0:
        return {}
    return json.loads(decompress_blob(rd.read(m0, ml), h["compression"]))
