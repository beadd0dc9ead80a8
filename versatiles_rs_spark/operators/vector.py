"""Vector-tile relational operators: property update join, layer/property filters.

Parity: vector_update_properties
(/root/reference/versatiles_pipeline/src/operations/vector/vector_update_properties.rs:50-137),
vector_filter_layers (vector_filter_layers.rs:32-54),
vector_filter_properties (vector_filter_properties.rs:35-63).

The reference loads the property table into a driver HashMap and probes per
feature — in Spark that is exactly a broadcast hash join; remove_non_matching
selects inner vs left-outer, replace_properties selects overwrite vs merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import register_operator


@register_operator("update_properties")
def update_properties(
    features: DataFrame,
    props: DataFrame,
    left_key: str,
    right_key: str,
    remove_non_matching: bool = False,
    replace_properties: bool = False,
    props_col: str | None = None,
) -> DataFrame:
    """Broadcast property join.

    - remove_non_matching=True  -> inner join (drop unmatched features)
    - remove_non_matching=False -> left outer (pass features through)
    - replace_properties only applies when both sides carry a map column
      `props_col`: True overwrites, False merges (right wins on key clash),
      mirroring vector_update_properties.rs:118-130.
    """
    how = "inner" if remove_non_matching else "left"
    joined = features.join(
        F.broadcast(props), features[left_key] == props[right_key], how
    )
    if props_col and props_col in features.columns and props_col in props.columns:
        left_m, right_m = features[props_col], props[props_col]
        if replace_properties:
            merged = F.coalesce(right_m, left_m)
        else:
            merged = F.when(right_m.isNull(), left_m).otherwise(
                F.map_concat(F.map_filter(left_m, lambda k, _: ~F.map_contains_key(right_m, k)), right_m)
            )
        joined = joined.withColumn(f"__{props_col}", merged)
        joined = joined.drop(props_col).withColumnRenamed(f"__{props_col}", props_col)
    return joined


@register_operator("filter_layers")
def filter_layers(
    df: DataFrame, names: list[str], invert: bool = False, layers: str = "layers"
) -> DataFrame:
    """Keep (or drop, invert=True) named layers inside each vector tile.

    Payload-level projection on a map<layer, features> column via the
    built-in map_filter higher-order function — no Python.
    vector_filter_layers.rs:32-54 (note: reference `invert=false` means
    *keep* listed layers).
    """
    names_arr = F.array(*[F.lit(n) for n in names])
    if invert:
        cond = lambda k, _: ~F.array_contains(names_arr, k)  # noqa: E731
    else:
        cond = lambda k, _: F.array_contains(names_arr, k)  # noqa: E731
    return df.withColumn(layers, F.map_filter(layers, cond))


@register_operator("filter_properties")
def filter_properties(
    df: DataFrame, pattern: str, invert: bool = False, props: str = "props"
) -> DataFrame:
    """Drop feature properties whose key matches a regex (invert to keep).

    vector_filter_properties.rs:35-63; map_filter + rlike, JVM-side.
    """
    if invert:
        cond = lambda k, _: k.rlike(pattern)  # noqa: E731
    else:
        cond = lambda k, _: ~k.rlike(pattern)  # noqa: E731
    return df.withColumn(props, F.map_filter(props, cond))
