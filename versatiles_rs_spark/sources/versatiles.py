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

Like the pmtiles writer, this is a single-file EDGE format, but the export
STREAMS: tiles arrive block-sorted through toLocalIterator and the driver
holds one 256x256 block of payload at a time, so archive size is bounded by
disk, not driver memory. For cluster-scale outputs the partitioned sinks
(sinks/writers.py) remain the parallel path.
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
    codec (header field), matching the reference's pass-through behavior.

    STREAMING single-file export: tiles are range-partitioned and sorted on
    the (z, x div 256, y div 256) block key and pulled through
    `toLocalIterator`, buffering exactly ONE 256x256 block of payload at a
    time (the reference writer's own working set, block_writer.rs:33-55) —
    the old 2M-tile collect cap is gone.  Blocks stream straight to `path`
    in sorted order after the fixed [header | meta] prefix; the 33-byte
    block definitions accumulate driver-side (one per block — slim) and the
    brotli block index + patched header are written at the end."""
    import numpy as np
    from pyspark.sql import functions as F

    from .. import tile_math as tm

    # slim pre-pass: per-zoom extents -> zoom range + geo bbox (one agg job)
    zstats = df.groupBy("z").agg(
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
    ).collect()
    if not zstats:
        raise ValueError("no tiles to write")
    zmin = min(int(r["z"]) for r in zstats)
    zmax = max(int(r["z"]) for r in zstats)
    lon_min = lat_min = 1e9
    lon_max = lat_max = -1e9
    for r in zstats:
        z = int(r["z"])
        w, s_, _, _ = tm.tile_to_geo_bbox(z, int(r["x0"]), int(r["y1"]))
        _, _, e, n = tm.tile_to_geo_bbox(z, int(r["x1"]), int(r["y0"]))
        lon_min, lat_min = min(lon_min, w), min(lat_min, s_)
        lon_max, lat_max = max(lon_max, e), max(lat_max, n)

    meta = json.dumps(metadata or {"tilejson": "3.0.0"}, sort_keys=True).encode()
    meta_blob = compress_blob(meta, compression)
    meta_range = (HEADER_LEN, len(meta_blob))

    ordered = (
        df.select(
            F.col("z").cast("int").alias("z"),
            F.col("x").cast("long").alias("x"),
            F.col("y").cast("long").alias("y"),
            F.col(payload).alias("_payload"),
            F.expr("x div 256").cast("long").alias("_bx"),
            F.expr("y div 256").cast("long").alias("_by"),
        )
        .repartitionByRange("z", "_bx", "_by")
        .sortWithinPartitions("z", "_bx", "_by")
    )

    index_entries: list[bytes] = []
    n_written = 0
    n_rows = 0

    def flush_block(f, key, tiles) -> None:
        """Write one 256x256 block (tiles segment + brotli tile index) and
        record its 33-byte definition — block_writer.rs:33-55."""
        nonlocal n_written
        z, bx, by = key
        gx_min = min(t[0] for t in tiles)
        gx_max = max(t[0] for t in tiles)
        gy_min = min(t[1] for t in tiles)
        gy_max = max(t[1] for t in tiles)
        w = gx_max - gx_min + 1
        h = gy_max - gy_min + 1
        tiles_off = f.tell()
        # per-tile relative ranges, row-major over the coverage bbox
        # (block_writer.rs:34 index_of; tile_index.rs TILE_INDEX_LENGTH=12)
        ranges = [(0, 0)] * (w * h)
        dedup: dict[bytes, tuple] = {}
        pos = 0
        for tx, ty, blob in tiles:
            idx = (ty - gy_min) * w + (tx - gx_min)
            if len(blob) < _DEDUP_MAX and blob in dedup:
                ranges[idx] = dedup[blob]
                continue
            rng = (pos, len(blob))
            f.write(blob)
            pos += len(blob)
            ranges[idx] = rng
            if len(blob) < _DEDUP_MAX:
                dedup[blob] = rng
            n_written += 1
        tiles_len = pos
        tidx = b"".join(struct.pack(">QI", o, ln) for o, ln in ranges)
        tidx_blob = compress_blob(tidx, "brotli")
        f.write(tidx_blob)
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

    with open(path, "wb") as f:
        f.write(b"\x00" * HEADER_LEN)
        f.write(meta_blob)
        cur_key = None
        buf: list[tuple[int, int, bytes]] = []
        for row in ordered.toLocalIterator(prefetchPartitions=True):
            key = (int(row["z"]), int(row["_bx"]), int(row["_by"]))
            if key != cur_key:
                if buf:
                    flush_block(f, cur_key, buf)
                cur_key, buf = key, []
            buf.append((int(row["x"]), int(row["y"]), bytes(row["_payload"])))
            n_rows += 1
        if buf:
            flush_block(f, cur_key, buf)

        block_index_blob = compress_blob(b"".join(index_entries), "brotli")
        blocks_range = (f.tell(), len(block_index_blob))
        f.write(block_index_blob)
        f.seek(0)
        f.write(
            _header_blob(
                tile_type, compression, (zmin, zmax),
                (lon_min, lat_min, lon_max, lat_max), meta_range, blocks_range,
            )
        )
    return n_rows


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
    """Scan a .versatiles archive into an XYZ tile DataFrame — DISTRIBUTED
    (reader.rs flow: header -> brotli block index -> per-block brotli tile
    index -> ranges): the driver fetches only the 66-byte header and the
    slim block index (33 bytes per 256x256 block); each executor task
    range-reads and unpacks its own blocks, so payload bytes never pass
    through the driver and archive size is unbounded.  `path` may be a
    local file or an http(s):// URL — executors open their own range
    readers (data_reader_http.rs:91-98 parity)."""
    import pandas as pd

    from ..remote import open_range_reader

    rd = open_range_reader(path)
    h = parse_versatiles_header(rd.read(0, HEADER_LEN))
    b0, bl = h["blocks_range"]
    bindex = decompress_blob(rd.read(b0, bl), "brotli")
    n_blocks = len(bindex) // 33
    if not n_blocks:
        return spark.createDataFrame([], "z int, x long, y long, bytes binary")
    work = pd.DataFrame(
        {"i": range(n_blocks),
         "entry": [bytes(bindex[i * 33 : i * 33 + 33]) for i in range(n_blocks)]}
    )
    n_parts = min(n_blocks, max(1, spark.sparkContext.defaultParallelism))

    def gen(batches):
        rdr = open_range_reader(path)
        for pdf in batches:
            rows = []
            for entry in pdf["entry"]:
                rows.extend(_iter_block_tiles(rdr, bytes(entry)))
            if rows:
                yield pd.DataFrame(rows, columns=["z", "x", "y", "bytes"])

    return (
        spark.createDataFrame(work)
        .repartitionByRange(n_parts, "i")
        .mapInPandas(gen, schema="z int, x long, y long, bytes binary")
    )


def read_versatiles_metadata(path: str) -> dict:
    from ..remote import open_range_reader

    rd = open_range_reader(path)
    h = parse_versatiles_header(rd.read(0, HEADER_LEN))
    m0, ml = h["meta_range"]
    if ml == 0:
        return {}
    return json.loads(decompress_blob(rd.read(m0, ml), h["compression"]))
