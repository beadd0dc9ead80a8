"""Corpus-curation CLI — the engine's text-pipeline toolbox over any
parquet document table (the training-data counterpart of tools/analyze.py;
the reference's toolbox stops at convert/probe/serve, this command exposes
the corpus analyses the reference has no analog for).

    python tools/curate.py profile  docs.parquet [--text text] [--id doc_id]
    python tools/curate.py quality  docs.parquet [--min-quality 0.5]
    python tools/curate.py dedup    docs.parquet [--threshold 0.5]
    python tools/curate.py jaccard  docs.parquet [--num 1 --den 2]
    python tools/curate.py recall   docs.parquet
    python tools/curate.py all      docs.parquet

profile   row/length/distinct statistics (functions/profile.py)
quality   composite quality score + language-ID histogram + survivor count
dedup     exact-dup groups + MinHash-LSH near-dup clusters (keeper policy)
jaccard   EXACT n-gram Jaccard pairs via the PPJoin prefix-filtered join
recall    MinHash-LSH recall against the exact-Jaccard ground truth
          (bounded-eval-slice harness: run it on a sample at corpus scale)

Expected columns: a text column (--text, default `text`) and an id column
(--id, default `doc_id`).  Every command prints one compact JSON object to
stdout and a short human summary to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _err(msg: str) -> None:
    print(msg, file=sys.stderr)


def cmd_profile(spark, df, args):
    from versatiles_rs_spark.functions.profile import profile_table

    rows = profile_table(
        df, strings=[args.text], categorical=[args.id_col]
    ).collect()
    stats = {f"{r['col']}.{r['stat']}": r["value"] for r in rows}
    _err(f"profile: {len(stats)} stats")
    return {"profile": stats}


def cmd_quality(spark, df, args):
    from pyspark.sql import functions as F

    from versatiles_rs_spark.functions.text import quality_score, with_langid

    q = with_langid(quality_score(df, text=args.text), text=args.text)
    agg = q.agg(
        F.count("*").alias("n"),
        F.round(F.avg("quality"), 4).alias("mean_quality"),
        F.sum((F.col("quality") >= args.min_quality).cast("long")).alias("survivors"),
    ).collect()[0]
    langs = {r["lang"]: r["n"] for r in q.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    _err(
        f"quality: {agg['n']} docs, mean {agg['mean_quality']}, "
        f"{agg['survivors']} pass >= {args.min_quality}; langs {langs}"
    )
    return {
        "n_docs": agg["n"],
        "mean_quality": agg["mean_quality"],
        "survivors": agg["survivors"],
        "min_quality": args.min_quality,
        "languages": langs,
    }


def cmd_dedup(spark, df, args):
    from pyspark.sql import functions as F

    from versatiles_rs_spark.functions.dedup import (
        exact_dedup_groups,
        minhash_lsh_pairs,
    )
    from versatiles_rs_spark.functions.graph import dedup_clusters

    n = df.count()
    ex = exact_dedup_groups(df, text_col=args.text, id_col=args.id_col)
    exagg = ex.agg(
        F.count("*").alias("distinct_contents"),
        F.sum(F.col("n_dups") - 1).alias("exact_dup_rows"),
    ).collect()[0]
    pairs = minhash_lsh_pairs(
        df, text_col=args.text, id_col=args.id_col, threshold=args.threshold
    )
    cl = dedup_clusters(pairs, src="id_a", dst="id_b")
    clagg = cl.agg(
        F.countDistinct("cluster").alias("clusters"),
        F.count("*").alias("clustered_docs"),
        F.sum((~F.col("is_keeper")).cast("long")).alias("near_dup_rows"),
    ).collect()[0]
    _err(
        f"dedup: {n} docs, {exagg['distinct_contents']} distinct contents "
        f"({exagg['exact_dup_rows']} exact-dup rows); near-dup: "
        f"{clagg['clusters']} clusters over {clagg['clustered_docs']} docs, "
        f"{clagg['near_dup_rows']} rows would drop at J>={args.threshold}"
    )
    return {
        "n_docs": n,
        "distinct_contents": exagg["distinct_contents"],
        "exact_dup_rows": int(exagg["exact_dup_rows"] or 0),
        "threshold": args.threshold,
        "near_dup_clusters": clagg["clusters"],
        "clustered_docs": clagg["clustered_docs"],
        "near_dup_rows": int(clagg["near_dup_rows"] or 0),
    }


def cmd_jaccard(spark, df, args):
    from pyspark.sql import functions as F

    from versatiles_rs_spark.functions.dedup import exact_jaccard_pairs

    pairs = exact_jaccard_pairs(
        df,
        text_col=args.text,
        id_col=args.id_col,
        threshold_num=args.num,
        threshold_den=args.den,
    )
    agg = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg("jaccard"), 4).alias("mean_jaccard"),
        F.sum((F.col("jaccard") == 1.0).cast("long")).alias("identical_pairs"),
    ).collect()[0]
    _err(
        f"jaccard: {agg['n_pairs']} pairs >= {args.num}/{args.den} "
        f"(mean {agg['mean_jaccard']}, {int(agg['identical_pairs'] or 0)} identical)"
    )
    return {
        "threshold": f"{args.num}/{args.den}",
        "n_pairs": agg["n_pairs"],
        "mean_jaccard": agg["mean_jaccard"],
        "identical_pairs": int(agg["identical_pairs"] or 0),
    }


def cmd_recall(spark, df, args):
    from versatiles_rs_spark.functions.dedup import (
        exact_jaccard_pairs,
        minhash_lsh_pairs,
    )

    truth = exact_jaccard_pairs(
        df, text_col=args.text, id_col=args.id_col
    ).select("id_a", "id_b").cache()
    found = minhash_lsh_pairs(
        df, text_col=args.text, id_col=args.id_col, threshold=0.5
    ).select("id_a", "id_b").cache()
    n_true = truth.count()
    n_found = found.count()
    n_hit = truth.join(found, on=["id_a", "id_b"]).count()
    recall = 1.0 if n_true == 0 else n_hit / n_true
    _err(f"recall: {n_hit}/{n_true} truth pairs found ({recall:.4f}); LSH emitted {n_found}")
    return {
        "n_true": n_true,
        "n_found": n_found,
        "n_hit": n_hit,
        "recall": round(recall, 6),
    }


COMMANDS = {
    "profile": cmd_profile,
    "quality": cmd_quality,
    "dedup": cmd_dedup,
    "jaccard": cmd_jaccard,
    "recall": cmd_recall,
}


def main(argv=None):
    ap = argparse.ArgumentParser(prog="curate")
    ap.add_argument("command", choices=list(COMMANDS) + ["all"])
    ap.add_argument("path")
    ap.add_argument("--text", default="text")
    ap.add_argument("--id", dest="id_col", default="doc_id")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--num", type=int, default=1)
    ap.add_argument("--den", type=int, default=2)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args(argv)

    from versatiles_rs_spark.session import get_spark

    spark = get_spark(app_name="curate", master=args.master, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.path)
    for col in (args.text, args.id_col):
        if col not in df.columns:
            ap.error(f"column {col!r} not in {args.path} (has {df.columns})")

    names = list(COMMANDS) if args.command == "all" else [args.command]
    out = {}
    for name in names:
        out[name] = COMMANDS[name](spark, df, args)
    print(json.dumps(out if args.command == "all" else out[names[0]]))


if __name__ == "__main__":
    main()
