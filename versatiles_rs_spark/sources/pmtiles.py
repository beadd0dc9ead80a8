"""PMTiles v3 container support (real format, stdlib only).

Parity: /root/reference/versatiles_container/src/container/pmtiles/
(writer.rs + types/header_v3.rs + types/entries_v3.rs) and the public
PMTiles v3 spec:

- 127-byte little-endian header: "PMTiles"+version(3), 8 u64 byte-ranges
  (root dir, metadata, leaf dirs, tile data), 3 u64 counts, clustered flag,
  internal/tile compression enums (1=none 2=gzip), tile type enum
  (1=mvt 2=png 3=jpeg 4=webp), zoom bounds, e7-scaled bbox/center.
- varint directories: entry count, tile-id deltas, run lengths, lengths,
  offsets (0 = contiguous with previous, else offset+1). run_length=0 marks
  a leaf-directory pointer.
- root directory must fit in 16384-127 bytes (gzip'd); overflow splits into
  leaf directories appended after the tile data.
- tile ids are the Hilbert index the engine already computes
  (tile_math.hilbert_index — golden-tested against the reference).

Single-file edge format: export pulls the (already Hilbert-sorted) tiles
through the driver like the mbtiles writer; the strict-increasing-id
invariant of the reference writer (writer.rs:201-206) is asserted here too.
"""

from __future__ import annotations

import gzip
import json
import struct

from pyspark.sql import DataFrame, SparkSession

HEADER_LEN = 127
ROOT_SPACE = 16384 - HEADER_LEN
_COMPRESSION = {"none": 1, "gzip": 2, "brotli": 3}
_TILE_TYPE = {"unknown": 0, "mvt": 1, "png": 2, "jpg": 3, "jpeg": 3, "webp": 4, "avif": 5}
_TYPE_NAME = {v: k for k, v in _TILE_TYPE.items() if k != "jpeg"}


def _write_varint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def serialize_entries(entries: list[tuple[int, int, int, int]]) -> bytes:
    """entries: (tile_id, offset, length, run_length) — entries_v3.rs:262-299."""
    out = bytearray()
    _write_varint(out, len(entries))
    last = 0
    for tid, _, _, _ in entries:
        _write_varint(out, tid - last)
        last = tid
    for _, _, _, rl in entries:
        _write_varint(out, rl)
    for _, _, ln, _ in entries:
        _write_varint(out, ln)
    for i, (_, off, ln, _) in enumerate(entries):
        if i > 0 and off == entries[i - 1][1] + entries[i - 1][2]:
            _write_varint(out, 0)
        else:
            _write_varint(out, off + 1)
    return bytes(out)


def deserialize_entries(buf: bytes) -> list[tuple[int, int, int, int]]:
    n, pos = _read_varint(buf, 0)
    ids, rls, lens, offs = [], [], [], []
    last = 0
    for _ in range(n):
        d, pos = _read_varint(buf, pos)
        last += d
        ids.append(last)
    for _ in range(n):
        v, pos = _read_varint(buf, pos)
        rls.append(v)
    for _ in range(n):
        v, pos = _read_varint(buf, pos)
        lens.append(v)
    for i in range(n):
        v, pos = _read_varint(buf, pos)
        if v == 0:
            offs.append(offs[i - 1] + lens[i - 1])
        else:
            offs.append(v - 1)
    return list(zip(ids, offs, lens, rls))


def _build_directories(entries) -> tuple[bytes, bytes]:
    """root_bytes (gzip), leaves_bytes — entries_v3.rs::as_directory."""
    root = gzip.compress(serialize_entries(entries), 6, mtime=0)
    if len(root) <= ROOT_SPACE:
        return root, b""
    leaf_size = 4096
    while True:
        leaves = bytearray()
        root_entries = []
        for i in range(0, len(entries), leaf_size):
            chunk = entries[i : i + leaf_size]
            ser = gzip.compress(serialize_entries(chunk), 6, mtime=0)
            root_entries.append((chunk[0][0], len(leaves), len(ser), 0))  # rl=0 -> leaf
            leaves.extend(ser)
        root = gzip.compress(serialize_entries(root_entries), 6, mtime=0)
        if len(root) <= ROOT_SPACE:
            return root, bytes(leaves)
        leaf_size *= 2


def write_pmtiles(
    df: DataFrame,
    path: str,
    metadata: dict | None = None,
    payload: str = "bytes",
    tile_type: str = "png",
    dedup: bool = True,
) -> int:
    """Export a tile DataFrame as a PMTiles v3 archive. Returns tiles written.

    Driver-side single-file EDGE format: Hilbert-clustering the directory
    requires global order, so tiles collect to the driver (the reference is
    single-process here too). Guarded; for cluster-scale output use the
    partitioned sinks (sinks/writers.py) and convert per shard.

    `dedup=True` (default) applies the two PMTiles v3 spec compressions the
    reference writer leaves on the table (writer.rs:140-142 sets all three
    header counts equal — no dedup, EntriesV3::push never merges runs):
    identical payloads share one data-section blob (content addressing —
    think ocean/empty tiles), and consecutive Hilbert ids with identical
    content collapse into one run-length entry. Our reader (and the spec's
    find_tile) already resolves rl>1 and shared offsets; the header then
    reports addressed_tiles >= tile_entries >= tile_contents honestly."""
    from .. import tile_math as tm
    import numpy as np

    rows = df.select("z", "x", "y", payload).collect()
    if len(rows) > 2_000_000:
        raise ValueError(
            f"write_pmtiles collects to the driver; {len(rows)} tiles > 2000000. "
            "Export partitioned (sinks/writers.py) instead."
        )
    tids = tm.hilbert_index(
        np.array([r.z for r in rows], dtype=np.int64),
        np.array([r.x for r in rows], dtype=np.int64),
        np.array([r.y for r in rows], dtype=np.int64),
    ) if rows else np.array([], dtype=np.int64)
    keyed = [
        (int(tid), int(r.z), int(r.x), int(r.y), bytes(r[3]))
        for tid, r in zip(tids, rows)
    ]
    keyed.sort(key=lambda t: t[0])
    for a, b in zip(keyed, keyed[1:]):  # strict-increasing ids (writer.rs:201-206)
        if a[0] >= b[0]:
            raise ValueError(f"duplicate tile id {b[0]} — one payload per (z,x,y) required")

    meta_blob = gzip.compress(
        json.dumps(metadata or {"name": "spark-tiles"}).encode(), 6, mtime=0
    )
    entries = []
    tile_blob = bytearray()
    blob_off: dict[bytes, int] = {}
    for tid, _, _, _, payload_bytes in keyed:
        if dedup and payload_bytes in blob_off:
            off = blob_off[payload_bytes]
        else:
            off = len(tile_blob)
            tile_blob.extend(payload_bytes)
            if dedup:
                blob_off[payload_bytes] = off
        ln = len(payload_bytes)
        if (
            dedup
            and entries
            and entries[-1][0] + entries[-1][3] == tid
            and entries[-1][1] == off
            and entries[-1][2] == ln
        ):
            last = entries[-1]
            entries[-1] = (last[0], off, ln, last[3] + 1)
        else:
            entries.append((tid, off, ln, 1))
    n_addressed = sum(e[3] for e in entries)
    n_contents = len(blob_off) if dedup else len(entries)
    root_bytes, leaves_bytes = _build_directories(entries)

    metadata_off = 16384
    tile_data_off = metadata_off + len(meta_blob)
    leaf_off = tile_data_off + len(tile_blob)

    zs = [k[1] for k in keyed]
    if keyed:
        min_lon = max_lon = min_lat = max_lat = None
        for z in sorted(set(zs)):  # one vectorized bbox call per zoom level
            xs = np.array([k[2] for k in keyed if k[1] == z])
            ys = np.array([k[3] for k in keyed if k[1] == z])
            w, s, e, n = tm.tile_to_geo_bbox(z, xs, ys)
            lo_x, hi_x = float(w.min()), float(e.max())
            lo_y, hi_y = float(s.min()), float(n.max())
            min_lon = lo_x if min_lon is None else min(min_lon, lo_x)
            max_lon = hi_x if max_lon is None else max(max_lon, hi_x)
            min_lat = lo_y if min_lat is None else min(min_lat, lo_y)
            max_lat = hi_y if max_lat is None else max(max_lat, hi_y)
    else:
        min_lon = max_lon = min_lat = max_lat = 0.0

    header = bytearray()
    header += b"PMTiles" + bytes([3])
    for off, ln in (
        (HEADER_LEN, len(root_bytes)),
        (metadata_off, len(meta_blob)),
        (leaf_off, len(leaves_bytes)),
        (tile_data_off, len(tile_blob)),
    ):
        header += struct.pack("<QQ", off, ln)
    header += struct.pack("<QQQ", n_addressed, len(entries), n_contents)
    header += bytes(
        [
            1,  # clustered (ids written in increasing order, contiguous data)
            _COMPRESSION["gzip"],  # internal compression
            _COMPRESSION["none"],  # tile compression (payloads stored raw)
            _TILE_TYPE.get(tile_type, 0),
            min(zs) if zs else 0,
            max(zs) if zs else 0,
        ]
    )
    header += struct.pack(
        "<iiii",
        int(min_lon * 1e7),
        int(min_lat * 1e7),
        int(max_lon * 1e7),
        int(max_lat * 1e7),
    )
    header += bytes([min(zs) if zs else 0])
    header += struct.pack(
        "<ii", int((min_lon + max_lon) * 5e6), int((min_lat + max_lat) * 5e6)
    )
    assert len(header) == HEADER_LEN, len(header)

    with open(path, "wb") as f:
        f.write(header)
        f.write(root_bytes)
        f.write(b"\x00" * (16384 - HEADER_LEN - len(root_bytes)))
        f.write(meta_blob)
        f.write(tile_blob)
        f.write(leaves_bytes)
    return n_addressed


def read_pmtiles_header(path: str) -> dict:
    from ..remote import open_range_reader

    buf = open_range_reader(path).read(0, HEADER_LEN)
    return parse_pmtiles_header(buf)


def parse_pmtiles_header(buf: bytes) -> dict:
    if buf[:7] != b"PMTiles" or buf[7] != 3:
        raise ValueError("not a PMTiles v3 archive")
    vals = struct.unpack_from("<8Q3Q", buf, 8)
    pos = 8 + 11 * 8
    clustered, internal_c, tile_c, tile_t, min_z, max_z = buf[pos : pos + 6]
    pos += 6
    bbox = struct.unpack_from("<iiii", buf, pos)
    return {
        "root_dir": (vals[0], vals[1]),
        "metadata": (vals[2], vals[3]),
        "leaf_dirs": (vals[4], vals[5]),
        "tile_data": (vals[6], vals[7]),
        "addressed_tiles": vals[8],
        "tile_entries": vals[9],
        "tile_contents": vals[10],
        "clustered": bool(clustered),
        "internal_compression": internal_c,
        "tile_compression": tile_c,
        "tile_type": _TYPE_NAME.get(tile_t, "unknown"),
        "min_zoom": min_z,
        "max_zoom": max_z,
        "bounds_e7": bbox,
    }


def read_pmtiles(spark: SparkSession, path: str) -> DataFrame:
    """Scan a PMTiles archive back into an XYZ tile DataFrame (root + leaf
    directories, Hilbert id decode). `path` may be a local file or an
    http(s):// URL — remote archives are read with ranged requests
    (data_reader_http.rs:91-98 parity): header, directories, and the tile
    data segment each fetch exactly one range."""
    from .. import tile_math as tm
    import numpy as np

    from ..remote import open_range_reader

    rd = open_range_reader(path)
    h = parse_pmtiles_header(rd.read(0, HEADER_LEN))
    if h["addressed_tiles"] > 2_000_000:
        raise ValueError(
            f"read_pmtiles materializes on the driver; {h['addressed_tiles']} "
            "tiles > 2000000. Serve point lookups via remote ranges instead."
        )

    def dir_at(rng):
        off, ln = rng
        return deserialize_entries(
            _decompress_section(rd.read(off, ln), h["internal_compression"], "internal")
        )

    entries = []
    for e in dir_at(h["root_dir"]):
        tid, off, ln, rl = e
        if rl == 0:  # leaf pointer
            entries.extend(dir_at((h["leaf_dirs"][0] + off, ln)))
        else:
            entries.append(e)
    t0, tlen = h["tile_data"]
    tile_data = rd.read(t0, tlen)
    # run_length > 1: spec-compliant archives address rl consecutive Hilbert
    # tile ids at the same offset/length (pmtiles spec §directories). Expand
    # the runs, then decode every id in ONE vectorized kernel call.
    tids, spans = [], []
    for tid, off, ln, rl in entries:
        for t in range(tid, tid + max(int(rl), 1)):
            tids.append(t)
            spans.append((off, ln))
    zs, xs, ys = tm.hilbert_decode(np.array(tids, dtype=np.int64))
    # tile payloads stay AS STORED (engine convention, mbtiles parity):
    # the header's tile_compression describes them, and callers thread that
    # codec (server._load_tile_source) or sniff it (mvt_pbf decode) — only
    # the engine-internal sections (directories, metadata) are decompressed
    rows = [
        (int(z), int(x), int(y), tile_data[off : off + ln])
        for z, x, y, (off, ln) in zip(zs, xs, ys, spans)
    ]
    return spark.createDataFrame(rows, "z int, x long, y long, bytes binary")


_COMP_NAME = {v: k for k, v in _COMPRESSION.items()}


def _decompress_section(data: bytes, enum: int, what: str) -> bytes:
    """Honor the header's compression enums (header_v3.rs semantics): the
    engine writes internal=gzip/tile=none, but spec-valid foreign archives
    may use none/gzip/brotli for either section."""
    if enum == _COMPRESSION["none"]:
        return data
    name = _COMP_NAME.get(enum)
    if name is None:
        raise ValueError(f"unsupported PMTiles {what} compression enum {enum}")
    from ..codecs import decompress_blob

    return decompress_blob(data, name)


def read_pmtiles_metadata(path: str) -> dict:
    from ..remote import open_range_reader

    rd = open_range_reader(path)
    h = parse_pmtiles_header(rd.read(0, HEADER_LEN))
    return json.loads(
        _decompress_section(rd.read(*h["metadata"]), h["internal_compression"], "internal")
    )
