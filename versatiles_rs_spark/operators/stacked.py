"""Multi-source overlay operators.

Parity:
- from_stacked: first-non-empty coalesce across N sources
  (/root/reference/versatiles_pipeline/src/operations/read/from_stacked.rs:1-16)
- from_stacked_raster: per-coordinate source-over alpha blend
  (from_stacked_raster.rs:57-74,146-189)
- from_merged_vector: concat features of same-named layers
  (from_merged_vector.rs:57-69)

Strategy at scale: `unionByName` + one hash aggregation on (z,x,y) — a single
shuffle regardless of source count — instead of N-1 chained outer joins. The
reference bounds memory with 16x16 tile blocks; Spark bounds it with Arrow
batch size + per-group pandas frames.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import register_operator


@register_operator("stacked_first_non_empty")
def stacked_first_non_empty(
    sources: list[DataFrame], keys=("z", "x", "y"), payload: str = "payload"
) -> DataFrame:
    """Winner-takes-first overlay: per key, payload of the lowest-priority-index
    source that has one. Emits `src` = 1-based winning source index.

    Implemented as unionByName + min_by over the priority — one shuffle.
    Equivalent to a full-outer-join + coalesce chain but O(1) joins.
    """
    keys = list(keys)
    tagged = [
        s.select(*keys, payload).withColumn("src", F.lit(i + 1)) for i, s in enumerate(sources)
    ]
    u = functools.reduce(lambda a, b: a.unionByName(b), tagged)
    u = u.filter(F.col(payload).isNotNull())
    return u.groupBy(*keys).agg(
        F.min_by(payload, "src").alias(payload), F.min("src").alias("src")
    )


@register_operator("stacked_raster_blend")
def stacked_raster_blend(
    sources: list[DataFrame],
    keys=("z", "x", "y"),
    payload: str = "bytes",
    fmt: str = "png",
    tile_size: int = 64,
) -> DataFrame:
    """Alpha-blend N raster sources per coordinate (source-over, first source
    on top, short-circuit once opaque) — from_stacked_raster.rs:57-74.

    groupBy(z,x,y).applyInPandas with a numpy compositing kernel; decode /
    encode via the engine codecs.
    """
    import pandas as pd

    from ..codecs import decode_image, encode_image

    keys = list(keys)
    tagged = [
        s.select(*keys, payload).withColumn("src", F.lit(i + 1)) for i, s in enumerate(sources)
    ]
    u = functools.reduce(lambda a, b: a.unionByName(b), tagged)

    out_schema = ", ".join(f"{k} long" for k in keys) + f", {payload} binary, n_blended int"

    def blend(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("src")
        imgs = (decode_image(bytes(b)) for b in pdf[payload])
        out, n = blend_kernel(imgs, return_n=True)
        blob = encode_image(out, fmt)
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row[payload] = [blob]
        row["n_blended"] = [n]
        return pd.DataFrame(row)

    return u.groupBy(*keys).applyInPandas(blend, schema=out_schema)


def blend_kernel(images: list, return_n: bool = False) -> "object":
    """Source-over fold of decoded RGBA arrays, first = top; returns the
    composited RGBA array (opaque short-circuit inside the loop), or
    (array, n_consumed) when return_n is set.

    Compositing runs in PREMULTIPLIED-alpha float space — source-over is
    exactly associative there, which is what makes the two-phase salted
    variant produce (near-)identical output; straight-alpha integer folds
    are not associative and would diverge across salt boundaries.
    """
    import numpy as np

    acc_c = acc_a = None  # premultiplied color, alpha in [0,1]
    n = 0
    for img in images:
        n += 1
        if img.shape[2] == 3:
            a = np.full(img.shape[:2] + (1,), 255, np.uint8)
            img = np.concatenate([img, a], axis=2)
        a = img[..., 3:4].astype(np.float64) / 255.0
        c = img[..., :3].astype(np.float64) / 255.0 * a
        if acc_c is None:
            acc_c, acc_a = c, a
        else:
            inv = 1.0 - acc_a
            acc_c = acc_c + c * inv
            acc_a = acc_a + a * inv
        if float(acc_a.min()) >= 1.0 - 1e-9:
            break
    straight = np.where(acc_a > 0, acc_c / np.maximum(acc_a, 1e-12), 0.0)
    out = np.concatenate([straight, acc_a], axis=2)
    out = np.clip(np.round(out * 255.0), 0, 255).astype("uint8")
    return (out, n) if return_n else out


def blend_images_per_tile(
    df: DataFrame,
    order_col: str,
    keys=("z", "x", "y"),
    payload: str = "bytes",
    fmt: str = "png",
    n_salts: int = 0,
) -> DataFrame:
    """Composite MANY images per tile (source-over, ordered by `order_col`
    ascending = topmost first) — the hot-cell-prone grouped-map op: a tile
    holding 20% of all rows lands on ONE worker.

    n_salts > 0 enables two-phase salted compositing: source-over is
    ASSOCIATIVE (not commutative) in premultiplied space, so salting chunks a
    contiguous ordered range per salt — salt = ntile(n_salts) over the
    group's order — then phase 2 folds the per-salt partials in salt order.
    Output is identical (parity-tested).

    MEASURED BREAK-EVEN (BENCH.md): the salted plan shuffles the payload
    twice (ntile window + partial groupBy), so it only wins when the hot
    group's per-image kernel cost dominates that extra shuffle — heavyweight
    decodes (512px tiles, AVIF) or network-shuffle clusters. At 16-64px on
    one box, single-phase + AQE is faster; leave n_salts=0 unless a straggler
    task is actually observed.
    """
    import pandas as pd
    from pyspark.sql import Window

    from ..codecs import decode_image, encode_image

    keys = list(keys)
    out_schema = ", ".join(f"{k} long" for k in keys) + f", {payload} binary"

    def blend_group(order_key):
        def blend(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order_key)
            imgs = (decode_image(bytes(b)) for b in pdf[payload])
            blob = encode_image(blend_kernel(imgs), fmt)
            row = {k: [pdf[k].iloc[0]] for k in keys}
            row[payload] = [blob]
            return pd.DataFrame(row)

        return blend

    if not n_salts:
        return df.groupBy(*keys).applyInPandas(blend_group(order_col), schema=out_schema)

    w = Window.partitionBy(*keys).orderBy(order_col)
    salted = df.withColumn("salt", F.ntile(n_salts).over(w))
    partial_schema = ", ".join(f"{k} long" for k in keys) + f", salt int, {payload} binary"

    def blend_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        imgs = (decode_image(bytes(b)) for b in pdf[payload])
        blob = encode_image(blend_kernel(imgs), fmt)
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["salt"] = [int(pdf["salt"].iloc[0])]
        row[payload] = [blob]
        return pd.DataFrame(row)

    partials = salted.groupBy(*keys, "salt").applyInPandas(blend_partial, schema=partial_schema)
    return partials.groupBy(*keys).applyInPandas(blend_group("salt"), schema=out_schema)


@register_operator("merged_vector")
def merged_vector(
    sources: list[DataFrame], keys=("z", "x", "y"), layers: str = "layers"
) -> DataFrame:
    """Merge vector sources: per coordinate, concatenate the feature lists of
    same-named layers (from_merged_vector.rs:57-69).

    Layers are modeled relationally as map<string, array<string>> columns;
    merging is explode -> groupBy(key, layer) -> flatten(collect_list) ->
    re-assemble — all built-in, no Python.
    """
    keys = list(keys)
    tagged = [s.select(*keys, layers).withColumn("src", F.lit(i + 1)) for i, s in enumerate(sources)]
    u = functools.reduce(lambda a, b: a.unionByName(b), tagged)
    exploded = u.select(*keys, "src", F.explode(layers).alias("layer", "features"))
    w = Window.partitionBy(*keys, "layer").orderBy("src")
    merged = (
        exploded.withColumn("features", F.flatten(F.collect_list("features").over(w)))
        .withColumn("rn", F.row_number().over(Window.partitionBy(*keys, "layer").orderBy(F.desc("src"))))
        .filter(F.col("rn") == 1)
        .drop("rn", "src")
    )
    return merged.groupBy(*keys).agg(
        F.map_from_entries(F.collect_list(F.struct("layer", "features"))).alias(layers)
    )
