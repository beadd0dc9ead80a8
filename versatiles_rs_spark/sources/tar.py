"""Tar tile container: {z}/{x}/{y}.{ext} entries inside a tar archive.

Parity: /root/reference/versatiles_container/src/container/tar/ (reader +
writer — any write order, same path scheme as the directory container).
Single-file edge format handled driver-side like mbtiles/pmtiles; the
analytical scan stays on parquet tile tables.

The .versatiles container lives in sources/versatiles.py (real read+write;
its mandatory Brotli indices use the system libbrotli via ctypes —
brotli_ctypes.py); its analytical 256x256 block layout is also mirrored by
sinks/writers.py::write_block_grouped for partitioned output.
"""

from __future__ import annotations

import io
import re
import tarfile

from pyspark.sql import DataFrame, SparkSession

_PATH_RE = re.compile(r"^\.?/?(\d+)/(\d+)/(\d+)\.([a-z0-9]+)$")


def write_tar(df: DataFrame, path: str, payload: str = "bytes", fmt_col: str = "fmt") -> int:
    """Write tiles as {z}/{x}/{y}.{fmt} members (tar/writer.rs:74)."""
    n = 0
    with tarfile.open(path, "w") as tf:
        for r in df.select("z", "x", "y", fmt_col, payload).toLocalIterator():
            blob = bytes(r[4])
            info = tarfile.TarInfo(name=f"{r.z}/{r.x}/{r.y}.{r[3]}")
            info.size = len(blob)
            info.mtime = 0  # deterministic archives
            tf.addfile(info, io.BytesIO(blob))
            n += 1
    return n


def read_tar(spark: SparkSession, path: str) -> DataFrame:
    """Scan a tile tar into (z, x, y, fmt, bytes); non-tile members skipped."""
    rows = []
    with tarfile.open(path, "r") as tf:
        for member in tf:
            if not member.isfile():
                continue
            m = _PATH_RE.match(member.name)
            if not m:
                continue
            blob = tf.extractfile(member).read()
            rows.append((int(m[1]), int(m[2]), int(m[3]), m[4], blob))
    return spark.createDataFrame(rows, "z int, x long, y long, fmt string, bytes binary")
