"""Streaming sink into SnapshotTable: exactly-once by idempotent commit.

Structured Streaming's contract for custom sinks is "foreachBatch may be
re-invoked with the SAME batchId after a failure; the sink must
deduplicate".  SnapshotTable's commit_id idempotence is exactly that
dedup: commit_id = f"{query_name}-batch{batch_id}" makes a replayed
micro-batch a no-op returning the already-committed snapshot, so the
stream's checkpoint + the table's commit log together give exactly-once
appends with NO distributed transaction — the same mechanism Delta/Iceberg
streaming sinks use.

Each micro-batch is one atomic snapshot: readers (read_latest /
changes()) never observe a torn batch, and a downstream incremental
consumer can follow the table with changes(last_seen_version) — the
snapshot log doubles as the stream's offset log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sinks.snapshots import SnapshotTable


def snapshot_sink(table: SnapshotTable, query_name: str, n_files: int = 4):
    """A foreachBatch callable committing each micro-batch as one atomic,
    batchId-idempotent snapshot append."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        table.commit_append(
            batch_df.coalesce(n_files), commit_id=f"{query_name}-batch{batch_id}"
        )

    return write_batch


def stream_to_snapshot_table(
    stream_df: DataFrame,
    table: SnapshotTable,
    checkpoint_dir: str,
    query_name: str = "ingest",
    available_now: bool = True,
):
    """Wire a streaming DataFrame into a SnapshotTable (exactly-once).
    availableNow=True drains the current backlog and stops — the batch
    boundary used by the ingest jobs; False runs continuous."""
    w = (
        stream_df.writeStream.foreachBatch(snapshot_sink(table, query_name))
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
