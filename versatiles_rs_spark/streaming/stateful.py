"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no event-time state (SURVEY.md §2.9); these are the
target-side extensions a continuous ingestion pipeline needs:

- `stream_dedup`: exactly-once *semantic* dedup across micro-batches — only
  the first row per content hash ever reaches the sink; per-group GroupState
  remembers seen hashes.
- `stream_tile_totals`: running per-tile accumulators (count) maintained in
  state, emitting updated totals every batch.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming exact dedup keyed by content hash.

    groupBy(md5(text)) -> stateful flatMap: state is a single 'seen' flag per
    hash; the first arriving row is emitted (deterministic min id within the
    batch), later rows — same batch or any later batch — are dropped.
    """
    hashed = stream.withColumn("h", F.md5(F.col(text_col)))
    out_schema = f"h string, {id_col} long, {text_col} string"
    state_schema = "seen boolean"

    def dedup_fn(
        key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            pdf = pdf.sort_values(id_col)
            head = pdf.iloc[:1]
            if first is None or head[id_col].iloc[0] < first[id_col].iloc[0]:
                first = head
        if first is not None:
            state.update((True,))
            yield first[["h", id_col, text_col]]

    return hashed.groupBy("h").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_tile_totals(stream: DataFrame, zoom: int = 6, key_col: str = "value") -> DataFrame:
    """Running per-tile counts with explicit state (update-per-batch output).

    The stateful analog of the batch tile_assign aggregation: state carries
    the cumulative count; each batch emits the new total for touched tiles.
    """
    from ..udfs import derived_lat_expr, derived_lon_expr, with_tile_columns

    pts = stream.withColumn("lon", derived_lon_expr(F.col(key_col))).withColumn(
        "lat", derived_lat_expr(F.col(key_col))
    )
    tiled = with_tile_columns(pts, "lon", "lat", zoom=zoom)
    out_schema = "z int, x long, y long, total long"
    state_schema = "total long"

    def totals_fn(
        key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        prev = state.get[0] if state.exists else 0
        n = sum(len(pdf) for pdf in pdfs)
        total = prev + n
        state.update((total,))
        z, x, y = key
        yield pd.DataFrame({"z": [z], "x": [x], "y": [y], "total": [total]})

    return tiled.groupBy("z", "x", "y").applyInPandasWithState(
        totals_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
