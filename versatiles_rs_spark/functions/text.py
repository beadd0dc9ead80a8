"""Text-analysis operators: quality metrics, language ID, token counting,
document fingerprinting.

Hot-path metrics are pure column expressions (JVM/codegen); language ID and
fingerprints are Arrow-batched numpy kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType


def with_quality_metrics(df: DataFrame, text: str = "text") -> DataFrame:
    """Whitespace token count, char count, letter frequency — all built-in
    string expressions so they stay inside WholeStageCodegen."""
    t = F.col(text)
    return (
        df.withColumn("n_tokens", F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1)
        .withColumn("n_chars2", F.length(t))
        .withColumn("n_e", (F.length(t) - F.length(F.replace(t, F.lit("e"), F.lit("")))).cast("long"))
    )


def quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Composite quality score: length band + mean token length band +
    alpha ratio — filterable column, no Python."""
    t = F.col(text)
    n_chars = F.length(t)
    n_tokens = n_chars - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    mean_tok = n_chars / n_tokens
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", "")) / n_chars
    score = (
        F.when((n_chars >= 50) & (n_chars <= 100000), 1.0).otherwise(0.0)
        + F.when((mean_tok >= 3) & (mean_tok <= 12), 1.0).otherwise(0.0)
        + alpha
    ) / 3.0
    return df.withColumn("quality", F.round(score, 4))


# deterministic tiny stopword profiles for n-gram/stopword language ID
_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " die ", " und ", " das ", " ist "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " la ", " los ", " que ", " es "],
    "zh": ["的", "是", "了", "在", "我"],
}


@pandas_udf(StringType())
def langid_udf(texts: pd.Series) -> pd.Series:
    """Marker-frequency language ID (n-gram heuristic). Vectorized per batch
    via pandas str.count; deterministic tie-break by language code."""
    padded = (" " + texts.str.lower() + " ").fillna("")
    scores = {}
    for lang, markers in sorted(_LANG_MARKERS.items()):
        s = None
        for m in markers:
            c = padded.str.count(m if lang == "zh" else m.replace(" ", "\\s"))
            s = c if s is None else s + c
        scores[lang] = s
    mat = pd.DataFrame(scores)
    best = mat.idxmax(axis=1)
    best[mat.max(axis=1) == 0] = "unknown"
    return best


def with_langid(df: DataFrame, text: str = "text") -> DataFrame:
    return df.withColumn("lang_pred", langid_udf(F.col(text)))


@pandas_udf(LongType())
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    """Winnowing-style document fingerprint: min rolling hash over 8-byte
    windows — stable under small edits elsewhere in the document."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        b = np.frombuffer((t or "").encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < 8:
            b = np.pad(b, (0, 8 - len(b)))
        windows = np.lib.stride_tricks.sliding_window_view(b, 8).astype(np.uint64)
        pw = np.uint64(131) ** np.arange(8, dtype=np.uint64)
        h = windows @ pw
        # splitmix finalizer
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = h ^ (h >> np.uint64(31))
        out[i] = int(h.min().astype(np.int64))
    return pd.Series(out)


def with_fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", fingerprint_udf(F.col(text)))


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k salient terms per document by a tf-idf-style relevance score.

    score = tf * (N + 1) / (doc_freq + 1) — deliberately RATIONAL (one
    integer multiply + one IEEE division, both exactly specified) instead of
    the usual log idf: a transcendental can differ by 1 ulp between engines
    and flip near-tied rankings, breaking cross-engine reproducibility of
    the selected term set. Monotonic in the log formulation per fixed tf,
    so the ranking intent is preserved.

    Plan shape: tokenize map-side (split/explode, JVM), one groupBy for tf,
    one for doc_freq (both slim (id, term) rows), a term-keyed join, one
    window for the per-doc top-k. `n_docs` skips the count job when the
    caller already knows the corpus size (table stats / previous stage).
    Ties broken by term ascending, so output is deterministic.
    """
    from pyspark.sql import Window

    n = n_docs if n_docs is not None else df.count()
    toks = (
        df.select(F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    scored = tf.join(docfreq, on="term").withColumn(
        "score", (F.col("tf") * F.lit(n + 1)).cast("double") / (F.col("doc_freq") + F.lit(1))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "doc_freq", F.round("score", 6).alias("score"), "rank")
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filters (Rae et al. 2021 §A.1.1, public paper):
# documents dominated by a few repeated words/n-grams are boilerplate.
# ---------------------------------------------------------------------------

def _max_run_expr(sorted_arr: str, n: str) -> str:
    """SQL expr: longest run of equal adjacent elements in a SORTED array =
    max multiplicity of any element. Pure higher-order functions — stays in
    the JVM, no shuffle, no UDF. Guards the sequence() descending trap
    (sequence(2,1) counts DOWN) behind a CASE on n < 2."""
    return f"""
    CASE WHEN {n} < 2 THEN {n} ELSE aggregate(
      sequence(2, {n}),
      named_struct('cur', 1, 'best', 1),
      (acc, i) -> IF(element_at({sorted_arr}, i) = element_at({sorted_arr}, i - 1),
                     named_struct('cur', acc.cur + 1,
                                  'best', greatest(acc.best, acc.cur + 1)),
                     named_struct('cur', 1, 'best', acc.best)),
      acc -> acc.best) END
    """


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition metrics + keep flag, entirely map-side.

    Emits integer counts, never fractions: `5*top_word_count <= n_words`
    is bit-stable across engines where `top_word_count/n_words <= 0.2`
    invites an IEEE near-tie flip (same rationale as tfidf_topk's rational
    score). No shuffle: each doc's metrics derive from its own token array
    via array_sort + aggregate() — at 100 TB this folds into the scan,
    unlike the explode -> groupBy(doc, word) formulation which shuffles
    every token."""
    words = f"filter(split({text_col}, ' '), w -> w <> '')"
    d = df.selectExpr(
        id_col,
        f"{words} AS _w",
    ).selectExpr(
        id_col,
        "_w",
        "array_sort(_w) AS _sw",
        "CASE WHEN size(_w) >= 2 THEN array_sort(transform(sequence(1, size(_w) - 1),"
        " i -> concat_ws(' ', element_at(_w, i), element_at(_w, i + 1))))"
        " ELSE cast(array() AS array<string>) END AS _sbg",
    )
    return d.selectExpr(
        id_col,
        "cast(size(_w) AS bigint) AS n_words",
        "cast(size(array_distinct(_w)) AS bigint) AS n_unique",
        f"cast({_max_run_expr('_sw', 'size(_w)')} AS bigint) AS top_word_count",
        f"cast({_max_run_expr('_sbg', 'size(_sbg)')} AS bigint) AS top_bigram_count",
    ).selectExpr(
        id_col,
        "n_words",
        "n_unique",
        "top_word_count",
        "top_bigram_count",
        "(5 * top_word_count <= n_words AND"
        " 5 * top_bigram_count <= greatest(n_words - 1, 1)) AS keep",
    )


# ---------------------------------------------------------------------------
# PII redaction (regex scrub — emails/phones), pure JVM regexp.
# ---------------------------------------------------------------------------

# character classes + bounded quantifiers only: semantics identical between
# Java regex (Spark) and RE2 (DuckDB oracle)
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def pii_redact(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Count + mask emails and phone numbers (JVM regexp_count /
    regexp_replace — no Python in the path). Emails first: the phone
    pattern cannot match inside an already-inserted <EMAIL> token, so the
    two passes compose without interference."""
    t = F.col(text_col)
    return (
        df.withColumn("n_emails", F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("long"))
        .withColumn("n_phones", F.regexp_count(t, F.lit(PII_PHONE_RE)).cast("long"))
        .withColumn(
            out_col,
            F.regexp_replace(
                F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"),
                PII_PHONE_RE,
                "<PHONE>",
            ),
        )
    )
