"""WebDataset shard export (sinks/webdataset.py): layout, determinism,
keyed-shuffle parity with the SQL-replayable key, and killed-job resume in
both modes."""

import hashlib
import json
import os
import tarfile

import duckdb
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.fixtures import images_df
from versatiles_rs_spark.sinks.webdataset import (
    assign_shards,
    export_webdataset,
    read_webdataset,
    wds_key_sql,
)


def _imgs(spark, n=240):
    # stable row order per partition: range -> mapInPandas is deterministic
    return images_df(spark, n=n, size=16, partitions=4)


def _sha_dir(d):
    out = {}
    for f in sorted(os.listdir(d)):
        if f.endswith(".tar"):
            out[f] = hashlib.sha256(open(os.path.join(d, f), "rb").read()).hexdigest()
    return out


def test_wds_key_matches_duckdb(spark):
    df = spark.range(0, 5000, 1, 4).select(F.col("id").alias("doc_id"))
    got = {
        r.doc_id: r.k
        for r in assign_shards(df, "doc_id", n_shards=16, epoch=2)
        .select("doc_id", F.col("wds_key").alias("k"))
        .collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT doc_id, {wds_key_sql('doc_id', 2, div='//')} AS k "
            "FROM (SELECT unnest(range(5000)) AS doc_id)"
        ).fetchall()
    )
    assert got == want
    # the mix actually shuffles: keys are not monotone in id
    ks = [got[i] for i in range(100)]
    assert ks != sorted(ks)
    # epoch changes the permutation
    other = assign_shards(df, "doc_id", n_shards=16, epoch=3).select("wds_key")
    assert [r.wds_key for r in other.limit(50).collect()] != ks[:50]


def test_partition_mode_layout_and_roundtrip(spark, tmp_path):
    out = str(tmp_path / "wds")
    man = export_webdataset(_imgs(spark), out, mode="partition", samples_per_shard=50)
    # 240 rows over 4 partitions of 60 -> per partition: 50 + 10
    assert len(man) == 8
    assert sum(m["n_samples"] for m in man) == 240
    assert {m["n_samples"] for m in man} == {50, 10}
    # member grouping: key.ext, key.txt, key.json adjacent per sample
    with tarfile.open(os.path.join(out, man[0]["shard_name"] + ".tar")) as tf:
        names = tf.getnames()
    assert len(names) % 3 == 0
    for i in range(0, len(names), 3):
        keys = {n.rsplit(".", 1)[0] for n in names[i : i + 3]}
        exts = {n.rsplit(".", 1)[1] for n in names[i : i + 3]}
        assert len(keys) == 1 and {"txt", "json"} <= exts
    back = read_webdataset(spark, out)
    assert back.count() == 240
    # captions and metadata survive byte-exactly
    src = {r.image_id: r for r in _imgs(spark).collect()}
    for r in back.collect():
        s = src[r.key]
        assert r.caption == s.caption
        assert bytes(r.bytes) == bytes(s.bytes)
        meta = json.loads(r.meta_json)
        assert (meta["w"], meta["h"], meta["fmt"]) == (s.w, s.h, s.fmt)


def test_partition_mode_deterministic_bytes(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    export_webdataset(_imgs(spark), a, mode="partition", samples_per_shard=50)
    export_webdataset(_imgs(spark), b, mode="partition", samples_per_shard=50)
    ha, hb = _sha_dir(a), _sha_dir(b)
    assert ha and ha == hb


def test_keyed_mode_contents_and_determinism(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    man = export_webdataset(_imgs(spark), a, mode="keyed", n_shards=8, epoch=1)
    assert sum(m["n_samples"] for m in man) == 240
    assert len(man) == 8
    # shard membership matches the declared key arithmetic
    df = _imgs(spark).withColumn(
        "_wds_num", F.xxhash64("image_id").bitwiseAND(F.lit(2**62 - 1))
    )
    expect = {
        r.image_id: r.shard
        for r in assign_shards(df, "_wds_num", n_shards=8, epoch=1).collect()
    }
    back = read_webdataset(spark, a)
    for r in back.select("shard_name", "key").collect():
        assert int(r.shard_name.rsplit("-", 1)[1]) == expect[r.key]
    # byte-identical re-export regardless of input partitioning
    export_webdataset(
        _imgs(spark).repartition(13), b, mode="keyed", n_shards=8, epoch=1
    )
    assert _sha_dir(a) == _sha_dir(b)


def test_keyed_mode_resume_skips_committed(spark, tmp_path):
    out = str(tmp_path / "wds")
    export_webdataset(_imgs(spark), out, mode="keyed", n_shards=8, epoch=1)
    pristine = _sha_dir(out)
    # kill two shards; leave the rest committed
    victims = sorted(pristine)[:2]
    mtimes = {}
    for f in sorted(os.listdir(out)):
        if f.endswith(".tar") and f not in victims:
            mtimes[f] = os.path.getmtime(os.path.join(out, f))
    for v in victims:
        os.remove(os.path.join(out, v))
        os.remove(os.path.join(out, v + ".done"))
    man = export_webdataset(_imgs(spark), out, mode="keyed", n_shards=8, epoch=1)
    assert _sha_dir(out) == pristine
    assert sum(m["n_samples"] for m in man) == 240
    # committed shards were not rewritten
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f)) == t


def test_partition_mode_resume(spark, tmp_path):
    out = str(tmp_path / "wds")
    export_webdataset(_imgs(spark), out, mode="partition", samples_per_shard=50)
    pristine = _sha_dir(out)
    victim = sorted(pristine)[3]
    os.remove(os.path.join(out, victim))
    os.remove(os.path.join(out, victim + ".done"))
    man = export_webdataset(_imgs(spark), out, mode="partition", samples_per_shard=50)
    assert _sha_dir(out) == pristine
    assert sum(m["n_samples"] for m in man) == 240


def test_keyed_mode_no_done_sidecar_means_no_tmp_left(spark, tmp_path):
    out = str(tmp_path / "wds")
    export_webdataset(_imgs(spark, n=30), out, mode="keyed", n_shards=2, epoch=0)
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
    with pytest.raises(ValueError):
        export_webdataset(_imgs(spark, n=10), out, mode="bogus")
