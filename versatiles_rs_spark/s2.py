"""S2 cell ids — vectorized numpy implementation of the public s2geometry
cell-id algorithm (the `S2CellId::FromLatLng` path).

The north rule asks for "H3/S2 cell indexes". No S2 library ships in this
container, but the algorithm is fully public (s2geometry.io docs + the
reference C++): lat/lng -> unit XYZ -> cube face + (u,v) -> quadratic (s,t)
-> 30-bit (i,j) -> face-local Hilbert position -> 64-bit id
(3 face bits | 60 position bits | trailing 1). All steps below are
vectorized; the Hilbert walk uses the standard 4-bit lookup tables built
from kPosToIJ / kPosToOrientation exactly as s2geometry does.

Spark integration: `s2_cell_udf(level)` (Arrow-batched) and
`cells.with_cell_ids(..., kind="s2")`. Hierarchy algebra (`s2_parent`)
is pure bit math, usable as JVM expressions downstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf resolves stringified hints here

_LOOKUP_BITS = 4
_SWAP, _INVERT = 1, 2
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)
_MAX_LEVEL = 30

_lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
_lookup_ij = np.zeros_like(_lookup_pos)


def _init_lookup(level, i, j, orig_orient, orient, pos):
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
        _lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for k in range(4):
        _init_lookup(
            level, i + (r[k] >> 1), j + (r[k] & 1), orig_orient,
            orient ^ _POS_TO_ORIENT[k], pos + k,
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, _o, 0)


def _st_from_uv(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection (S2_QUADRATIC_PROJECTION, the default)."""
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1 + 3 * u), 1 - 0.5 * np.sqrt(1 - 3 * u))


def face_uv_from_lnglat(lng: np.ndarray, lat: np.ndarray):
    """(lng, lat) degrees -> (face, u, v)."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = np.radians(np.asarray(lng, dtype=np.float64))
    x = np.cos(phi) * np.cos(theta)
    y = np.cos(phi) * np.sin(theta)
    z = np.sin(phi)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az), np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        # np.choose evaluates every branch; unselected divisions by ~0 are
        # discarded (the chosen face's denominator is the largest component)
        u = np.choose(face, [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.choose(face, [z / x, z / y, -y / z, y / x, -x / y, -x / z])
    return face, u, v


def s2_cell_id(lng, lat, level: int = _MAX_LEVEL) -> np.ndarray:
    """Vectorized S2 cell id at `level` (leaf walk then parent-snap)."""
    face, u, v = face_uv_from_lnglat(np.atleast_1d(lng), np.atleast_1d(lat))
    smax = np.int64((1 << _MAX_LEVEL) - 1)
    i = np.clip((np.floor((1 << _MAX_LEVEL) * _st_from_uv(u))).astype(np.int64), 0, smax).astype(np.uint64)
    j = np.clip((np.floor((1 << _MAX_LEVEL) * _st_from_uv(v))).astype(np.int64), 0, smax).astype(np.uint64)

    n = face.astype(np.uint64) << np.uint64(60)
    bits = face.astype(np.uint64) & np.uint64(_SWAP)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    # 8 chunks of 4 i-bits + 4 j-bits (the s2geometry FromFaceIJ loop),
    # vectorized with fancy indexing into the lookup table
    for k in range(7, -1, -1):
        bits += ((i >> np.uint64(k * 4)) & mask) << np.uint64(_LOOKUP_BITS + 2)
        bits += ((j >> np.uint64(k * 4)) & mask) << np.uint64(2)
        bits = _lookup_pos[bits.astype(np.int64)]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 8)
        bits &= np.uint64(_SWAP | _INVERT)
    leaf = (n << np.uint64(1)) + np.uint64(1)
    if level >= _MAX_LEVEL:
        return leaf.astype(np.int64)
    return s2_parent(leaf.astype(np.int64), level)


def s2_lsb_for_level(level: int) -> int:
    return 1 << (2 * (_MAX_LEVEL - level))


def s2_parent(cell_id, level: int) -> np.ndarray:
    """Ancestor cell at `level` (pure bit math, also expressible JVM-side)."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    lsb = np.uint64(s2_lsb_for_level(level))
    return (((cid & (~(lsb - np.uint64(1)))) | lsb)).astype(np.int64)


def s2_level(cell_id) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    return (_MAX_LEVEL - (np.log2(lsb.astype(np.float64)) / 2).astype(np.int64)).astype(np.int64)


def s2_face(cell_id) -> np.ndarray:
    return (np.asarray(cell_id, dtype=np.uint64) >> np.uint64(61)).astype(np.int64)


def s2_cell_udf(level: int = 12):
    """Arrow-batched (lng, lat) -> S2 cell id column."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def udf(lng: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            s2_cell_id(lng.to_numpy(np.float64), lat.to_numpy(np.float64), level)
        )

    return udf
