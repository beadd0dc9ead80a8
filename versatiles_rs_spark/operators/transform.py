"""Coordinate + payload transforms: flip_y, swap_xy, recompression.

Parity: converter read/write transforms
(/root/reference/versatiles_container/src/types/converter.rs:201-256),
coordinate ops tile_coord.rs:179-184, compression
versatiles_core/src/utils/compression/functions.rs:141-200.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..udfs import flip_y_expr
from . import register_operator


@register_operator("flip_y")
def flip_y_df(df: DataFrame, z: str = "z", y: str = "y") -> DataFrame:
    """y -> 2^z - 1 - y (TMS <-> XYZ). Pure column expression."""
    return df.withColumn(y, flip_y_expr(F.col(z), F.col(y)))


@register_operator("swap_xy")
def swap_xy_df(df: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """Swap x and y columns."""
    cols = []
    for c in df.columns:
        if c == x:
            cols.append(F.col(y).alias(x))
        elif c == y:
            cols.append(F.col(x).alias(y))
        else:
            cols.append(F.col(c))
    return df.select(*cols)


@register_operator("recompress")
def recompress(
    df: DataFrame,
    target: str = "gzip",
    payload: str = "bytes",
    codec_col: str = "codec",
) -> DataFrame:
    """Re-encode payload compression (none <-> gzip <-> brotli; brotli via
    the system libbrotli ctypes binding, compression/functions.rs:141-200).

    Arrow-batched mapInPandas over the binary column. Skips work when the
    payload already has the target codec ("optimize_compression" semantics,
    functions.rs:55).
    """
    import pandas as pd

    from ..codecs import compress_blob, decompress_blob

    schema = df.schema

    def rec(batches):
        for pdf in batches:
            src = pdf[codec_col].to_numpy()
            vals = pdf[payload].tolist()
            out = []
            for blob, codec in zip(vals, src):
                if codec == target:
                    out.append(blob)
                else:
                    out.append(compress_blob(decompress_blob(bytes(blob), codec), target))
            pdf[payload] = pd.Series(out, index=pdf.index)
            pdf[codec_col] = target
            yield pdf

    return df.mapInPandas(rec, schema=schema)
