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
        import numpy as np

        pdf = pdf.sort_values("src")
        acc = None
        n = 0
        for raw in pdf[payload]:
            img = decode_image(bytes(raw))
            if img.shape[2] == 3:  # no alpha -> opaque
                a = np.full(img.shape[:2] + (1,), 255, np.uint8)
                img = np.concatenate([img, a], axis=2)
            if acc is None:
                acc = img.astype(np.uint16)
            else:
                # source-over: acc over img (acc is the upper layer stack)
                aa = acc[..., 3:4]
                inv = 255 - aa
                acc[..., :3] = (acc[..., :3] * aa + img[..., :3].astype(np.uint16) * inv + 127) // 255
                acc[..., 3:4] = aa + (img[..., 3:4].astype(np.uint16) * inv + 127) // 255
            n += 1
            if int(acc[..., 3].min()) == 255:  # opaque short-circuit (:68-70)
                break
        blob = encode_image(acc.astype(np.uint8), fmt)
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row[payload] = [blob]
        row["n_blended"] = [n]
        return pd.DataFrame(row)

    return u.groupBy(*keys).applyInPandas(blend, schema=out_schema)


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
