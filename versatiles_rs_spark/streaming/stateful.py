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


def stream_sessions(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Streaming gap sessionization — the continuous twin of
    functions/sessions.sessionize, with per-user GroupState.

    State per user: (session_seq, start_us, last_us, n_events). Each batch
    sorts its rows by event time, extends or opens sessions by the same
    >gap rule as the batch operator, and emits the updated row for every
    session TOUCHED in the batch (update output mode) — downstream sinks
    upsert on (user, session_seq).

    Ordering contract: in-batch disorder is handled (sorted before the
    walk); an event arriving in a LATER batch with an earlier timestamp
    than state.last_us cannot reopen a closed session — it extends the
    current one (its gap measured against last_us). That is the standard
    arrival-order semantics of streaming sessionization; replaying the
    batch operator over the full log is the reconciliation path, exactly
    like the dedup/totals operators above.
    """
    ts_us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP '1970-01-01 00:00:00', {ts_col})"
    )
    gap_us = int(gap_seconds) * 1_000_000
    rows = stream.select(F.col(user_col).cast("long").alias("user_id"), ts_us.alias("us"))
    out_schema = "user_id long, session_seq long, n_events long, start_us long, end_us long"
    state_schema = "session_seq long, start_us long, last_us long, n_events long"

    def sessions_fn(
        key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        seq, start, last, n = state.get if state.exists else (0, None, None, 0)
        touched: dict[int, tuple[int, int, int]] = {}
        for pdf in pdfs:
            for us in pdf["us"].sort_values():
                us = int(us)
                if last is None or us - last > gap_us:
                    seq, start, n = seq + 1, us, 0
                # late event: us may precede last — the session end must
                # never move backwards
                last = max(us, last if last is not None else us)
                n += 1
                touched[seq] = (start, last, n)
        if not touched:
            return
        state.update((seq, start, last, n))
        (uid,) = key
        yield pd.DataFrame(
            [
                {"user_id": uid, "session_seq": s, "n_events": nn,
                 "start_us": st, "end_us": en}
                for s, (st, en, nn) in touched.items()
            ]
        )

    return rows.groupBy("user_id").applyInPandasWithState(
        sessions_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
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
