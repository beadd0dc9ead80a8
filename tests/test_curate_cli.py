"""curate CLI: the corpus-curation toolbox over a parquet document table."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "curate.py"), *args],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_curate_all(sf_dir):
    out = _run(["all", f"{sf_dir}/documents.parquet"])
    assert set(out) == {"profile", "quality", "dedup", "jaccard", "recall"}
    prof = out["profile"]["profile"]
    n = prof["*.rows"]
    assert n > 0 and prof["doc_id.n_distinct"] == n
    q = out["quality"]
    assert q["n_docs"] == n and 0.0 <= q["mean_quality"] <= 1.0
    assert sum(q["languages"].values()) == n
    d = out["dedup"]
    assert d["distinct_contents"] + d["exact_dup_rows"] == n
    # every clustered doc belongs to a cluster with exactly one keeper
    assert d["near_dup_rows"] == d["clustered_docs"] - d["near_dup_clusters"]
    j = out["jaccard"]
    # the LSH near-dup graph and the exact-Jaccard graph cover the same
    # corpus at the same threshold: found pairs == truth pairs here, and
    # recall must say so
    r = out["recall"]
    assert r["n_true"] == j["n_pairs"]
    assert r["n_hit"] <= r["n_true"] and 0.0 <= r["recall"] <= 1.0


def test_curate_column_validation(sf_dir, tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "curate.py"),
         "profile", f"{sf_dir}/documents.parquet", "--text", "nope"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode != 0
    assert "nope" in proc.stderr
