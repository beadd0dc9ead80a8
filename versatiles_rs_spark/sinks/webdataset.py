"""WebDataset-layout shard export for image+caption training tables.

The standard delivery format for web-scale image+caption training corpora
(Aizman et al., "High Performance I/O For Large Scale Deep Learning" — the
public WebDataset convention): POSIX tar shards whose members group by key,
`{key}.{ext}` (image payload) + `{key}.txt` (caption) + `{key}.json`
(metadata).  This sink turns the north-rule input table
(image_id, bytes, w, h, fmt, caption, phash) into such shards, Spark-first:

- **partition mode (default, the 100 TB path)**: ZERO shuffle — each input
  partition streams its rows into one or more `shard-{part:05d}-{seq:03d}.tar`
  files, split at `samples_per_shard`.  Payload bytes never enter an
  Exchange (the repo invariant); shard contents are deterministic given the
  stored table layout.  Epoch-to-epoch shuffling happens where WebDataset
  training does it anyway: shard-order shuffling + in-shard sample buffers
  at LOAD time, both driven by the deterministic `wds_key` this module also
  provides.
- **keyed mode**: content-addressed shards independent of input layout —
  `shard = wds_key(id, epoch) % n_shards`, one repartition on the shard
  column (the one honest payload shuffle, ~tar-size x n_shards task fan-in),
  rows sorted by `wds_key` within each shard.  Byte-identical output for the
  same (input, epoch) on ANY cluster size or input partitioning.

Both modes commit per shard: write to `<name>.tmp`, fsync, atomic
`os.replace`, then a `<name>.done` JSON sidecar (n_samples, data_bytes,
first/last key).  A killed export resumes by skipping committed shards —
in keyed mode the skip filter sits BEFORE the Exchange, so finished shards
don't even shuffle again.  Tars are byte-deterministic (mtime=0, uid=gid=0,
sorted member order) so re-runs are verifiable with a plain file hash.

The shuffle key is a 62-bit two-round affine mix in 31-bit lanes: every
product stays under 2^63 (Spark ANSI-safe) and the whole thing renders as
ANSI SQL for the DuckDB oracle (`wds_key_sql`), so shard manifests are
hash-verified cross-engine (queries.py::q_epoch_shards).

Reference analog: none — the reference serves tiles; exporting training
shards is project-brief scope (the "large-scale training-data pipeline"
clause), composed with its container writers' commit discipline
(versatiles_container/src/container/tar/writer.rs:74 path-scheme parity for
the tar layer itself).
"""

from __future__ import annotations

import io
import json
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOD = 2_147_483_648  # 2^31: lane modulus; all products < 2^63
_M_K1, _M_K2, _M_EP, _C1 = 1_664_525, 1_013_904_223, 69_069, 1_013_904_223
_M_R1, _M_R2, _C2 = 1_103_515_245, 12_345, 12_345


def wds_key_sql(key_sql: str, epoch: int, div: str = "div") -> str:
    """62-bit deterministic shuffle key as ANSI SQL over a non-negative
    BIGINT key expression.  `div` is the integer-division operator spelling:
    Spark `div`, DuckDB `//`.  Identical arithmetic on both engines — every
    intermediate is in [0, 2^63) so wrap/ANSI semantics never diverge."""
    k = f"CAST({key_sql} AS BIGINT)"
    k1 = f"({k} % {_MOD})"
    k2 = f"({k} {div} {_MOD})"
    r1 = f"(({k1} * {_M_K1} + {k2} * {_M_K2} + {epoch} * {_M_EP} + {_C1}) % {_MOD})"
    r2 = f"(({r1} * {_M_R1} + {k1} * {_M_R2} + {_C2}) % {_MOD})"
    return f"({r2} * CAST({_MOD} AS BIGINT) + {r1})"


def wds_key_expr(key_col: str, epoch: int) -> F.Column:
    """Spark column for :func:`wds_key_sql` (same rendering, `div`)."""
    return F.expr(wds_key_sql(key_col, epoch, div="div"))


def assign_shards(df: DataFrame, key_col: str, n_shards: int, epoch: int = 0) -> DataFrame:
    """Add (wds_key, shard) — the keyed-mode shard assignment.  Pure JVM
    column arithmetic; at corpus scale this folds into the scan (no job,
    no shuffle) and the later repartition(n_shards, shard) is the only
    exchange in the export."""
    key = wds_key_expr(key_col, epoch)
    return df.withColumn("wds_key", key).withColumn(
        "shard", F.pmod(F.col("wds_key"), F.lit(n_shards)).cast("int")
    )


# ---------------------------------------------------------------------------
# shard writer (runs inside mapInPandas tasks)
# ---------------------------------------------------------------------------

_EXT_FOR = {"png": "png", "jpg": "jpg", "jpeg": "jpg", "webp": "webp", "avif": "avif"}


class _ShardWriter:
    """Streams samples into one deterministic tar; commit = tmp->rename +
    .done sidecar.  Used inside executor tasks — stdlib only."""

    def __init__(self, out_dir: str, name: str):
        self.path = os.path.join(out_dir, name + ".tar")
        self.tmp = self.path + ".tmp"
        self.tf = tarfile.open(self.tmp, "w", format=tarfile.USTAR_FORMAT)
        self.n = 0
        self.data_bytes = 0
        self.first_key = None
        self.last_key = None

    def _member(self, name: str, blob: bytes):
        info = tarfile.TarInfo(name=name)
        info.size = len(blob)
        info.mtime = 0
        info.uid = info.gid = 0
        info.uname = info.gname = ""
        self.tf.addfile(info, io.BytesIO(blob))

    def add(self, key: str, blob: bytes, fmt: str, caption: str, meta: dict):
        ext = _EXT_FOR.get(fmt, "bin")
        self._member(f"{key}.{ext}", blob)
        self._member(f"{key}.txt", caption.encode("utf-8"))
        self._member(f"{key}.json", json.dumps(meta, sort_keys=True).encode("utf-8"))
        self.n += 1
        self.data_bytes += len(blob)
        if self.first_key is None:
            self.first_key = key
        self.last_key = key

    def commit(self) -> dict:
        self.tf.close()
        with open(self.tmp, "rb") as f:
            os.fsync(f.fileno())
        os.replace(self.tmp, self.path)
        done = {
            "path": self.path,
            "n_samples": self.n,
            "data_bytes": self.data_bytes,
            "first_key": self.first_key,
            "last_key": self.last_key,
        }
        tmp_done = self.path + ".done.tmp"
        with open(tmp_done, "w") as f:
            json.dump(done, f, sort_keys=True)
        os.replace(tmp_done, self.path + ".done")
        return done

    def abort(self):
        self.tf.close()
        if os.path.exists(self.tmp):
            os.remove(self.tmp)


_MANIFEST_SCHEMA = (
    "shard_name string, n_samples long, data_bytes long, first_key string, last_key string"
)


def _row_meta(row, skip: set[str]) -> dict:
    return {k: v for k, v in row.items() if k not in skip and not k.startswith("wds_")}


def export_webdataset(
    df: DataFrame,
    out_dir: str,
    *,
    mode: str = "partition",
    n_shards: int = 64,
    samples_per_shard: int = 10_000,
    epoch: int = 0,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    caption_col: str = "caption",
) -> list[dict]:
    """Export `df` as WebDataset tar shards under `out_dir`; returns the
    manifest (one dict per shard, committed + previously-committed).

    partition mode: no shuffle, shards follow input partitions (split at
    `samples_per_shard`).  keyed mode: deterministic global epoch shuffle,
    shard = wds_key % n_shards, one payload repartition; committed shards
    are filtered out BEFORE that exchange on resume."""
    os.makedirs(out_dir, exist_ok=True)
    done_shards = {
        f[: -len(".tar.done")]
        for f in os.listdir(out_dir)
        if f.endswith(".tar.done")
    }
    skip = {bytes_col, caption_col, "wds_key", "shard"}

    if mode == "keyed":
        if _is_numeric(df, id_col):
            keyed = assign_shards(df, key_col=id_col, n_shards=n_shards, epoch=epoch)
        else:
            # non-numeric ids: fold to a non-negative 62-bit key JVM-side
            # first (xxhash64 built-in); the mix then shuffles that
            keyed = assign_shards(
                df.withColumn(
                    "_wds_num", F.xxhash64(F.col(id_col)).bitwiseAND(F.lit(2**62 - 1))
                ),
                key_col="_wds_num",
                n_shards=n_shards,
                epoch=epoch,
            ).drop("_wds_num")
        done_ids = sorted(
            int(s.split("-")[-1]) for s in done_shards if s.startswith(f"wds-ep{epoch:03d}-")
        )
        if done_ids:
            # resume: committed shards drop out BEFORE the payload exchange
            keyed = keyed.filter(~F.col("shard").isin(done_ids))
        keyed = keyed.repartition(n_shards, "shard").sortWithinPartitions(
            "shard", "wds_key", id_col
        )

        def write_keyed(batches):
            state = {"shard": None, "name": None, "w": None}

            def roll(s):
                out = None
                if state["w"] is not None:
                    out = _manifest_pdf(state["w"].commit(), state["name"])
                state["shard"] = s
                state["name"] = f"wds-ep{epoch:03d}-{s:05d}"
                state["w"] = _ShardWriter(out_dir, state["name"])
                return out

            for pdf in batches:
                for row in pdf.to_dict("records"):
                    s = int(row["shard"])
                    if s != state["shard"]:
                        closed = roll(s)
                        if closed is not None:
                            yield closed
                    state["w"].add(
                        str(row[id_col]),
                        bytes(row[bytes_col]),
                        str(row[fmt_col]),
                        str(row[caption_col]),
                        _row_meta(row, skip),
                    )
            if state["w"] is not None:
                yield _manifest_pdf(state["w"].commit(), state["name"])

        man = keyed.mapInPandas(write_keyed, schema=_MANIFEST_SCHEMA).collect()
    elif mode == "partition":

        def write_partition(batches):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            seq, w, name, skipping = 0, None, None, 0
            for pdf in batches:
                for row in pdf.to_dict("records"):
                    if skipping:
                        # resume: this shard is committed; boundaries are
                        # deterministic (fixed samples_per_shard over an
                        # immutable input), so consume its rows unwritten
                        skipping -= 1
                        if skipping == 0:
                            seq += 1
                        continue
                    if w is None:
                        name = f"wds-p{pid:05d}-{seq:03d}"
                        if os.path.exists(os.path.join(out_dir, name + ".tar.done")):
                            skipping = samples_per_shard - 1
                            if skipping == 0:
                                seq += 1
                            continue
                        w = _ShardWriter(out_dir, name)
                    w.add(
                        str(row[id_col]),
                        bytes(row[bytes_col]),
                        str(row[fmt_col]),
                        str(row[caption_col]),
                        _row_meta(row, skip),
                    )
                    if w.n >= samples_per_shard:
                        yield _manifest_pdf(w.commit(), name)
                        w, seq = None, seq + 1
            if w is not None:
                yield _manifest_pdf(w.commit(), name)

        man = df.mapInPandas(write_partition, schema=_MANIFEST_SCHEMA).collect()
    else:
        raise ValueError(f"unknown mode {mode!r} (partition|keyed)")

    manifest = [r.asDict() for r in man]
    seen = {m["shard_name"] for m in manifest}
    for s in sorted(done_shards - seen):
        with open(os.path.join(out_dir, s + ".tar.done")) as f:
            d = json.load(f)
        manifest.append(
            {
                "shard_name": s,
                "n_samples": d["n_samples"],
                "data_bytes": d["data_bytes"],
                "first_key": d["first_key"],
                "last_key": d["last_key"],
            }
        )
    return sorted(manifest, key=lambda m: m["shard_name"])


def _manifest_pdf(done: dict, name: str):
    import pandas as pd

    return pd.DataFrame(
        [
            {
                "shard_name": name,
                "n_samples": done["n_samples"],
                "data_bytes": done["data_bytes"],
                "first_key": done["first_key"],
                "last_key": done["last_key"],
            }
        ]
    )


def _is_numeric(df: DataFrame, col: str) -> bool:
    t = dict(df.dtypes)[col]
    return t in ("bigint", "int", "smallint", "tinyint")


def read_webdataset(spark, out_dir: str) -> DataFrame:
    """Scan exported shards back into (shard_name, key, ext, bytes, caption,
    meta_json) — the verification-side reader (training loaders stream the
    tars directly).  Distributed: one task per shard via binaryFile on the
    committed tar list."""
    import pandas as pd  # noqa: F401

    done = [f for f in sorted(os.listdir(out_dir)) if f.endswith(".tar.done")]
    paths = [os.path.join(out_dir, f[: -len(".done")]) for f in done]
    if not paths:
        return spark.createDataFrame(
            [], "shard_name string, key string, ext string, bytes binary, caption string, meta_json string"
        )
    pdf_paths = spark.createDataFrame([(p,) for p in paths], "path string")

    def scan(batches):
        for pdf in batches:
            for p in pdf["path"]:
                rows = {}
                with tarfile.open(p, "r") as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        key, ext = m.name.rsplit(".", 1)
                        rows.setdefault(key, {})[ext] = tf.extractfile(m).read()
                out = []
                shard = os.path.basename(p)[: -len(".tar")]
                for key, members in rows.items():
                    caption = members.pop("txt", b"").decode("utf-8")
                    meta = members.pop("json", b"{}").decode("utf-8")
                    (ext, blob), = members.items()
                    out.append((shard, key, ext, blob, caption, meta))
                import pandas as pd

                yield pd.DataFrame(
                    out,
                    columns=["shard_name", "key", "ext", "bytes", "caption", "meta_json"],
                )

    return pdf_paths.mapInPandas(
        scan,
        schema="shard_name string, key string, ext string, bytes binary, caption string, meta_json string",
    )
