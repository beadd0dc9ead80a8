"""Product quantization (PQ) ANN: 64x embedding compression + table-lookup
scoring — the canonical billion-scale path (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011; FAISS IVFPQ).

Why this matters at 10^12 rows: IVF alone (functions/ann.py::ann_ivf_topk)
still ships full float vectors through the candidate join.  PQ splits each
(normalized) embedding into `m` subvectors, quantizes each against a
`ksub`-entry per-subspace codebook, and packs the codes into ONE BIGINT
(m=8, ksub=16 -> 4 bits/code -> 32 bits): a 64-dim float32 embedding (256 B)
becomes 4 B.  Query scoring is asymmetric distance computation (ADC): the
query builds an (m x ksub) lookup table once, and every candidate scores as
a fixed-order sum of m table lookups — pure JVM expressions over the packed
code (shiftrightunsigned / & / element_at), no vector math in the hot path.

Plan shape (ann_ivfpq_topk): ONE fused Arrow pass over the vectors emits
slim (id, ivf_list, pq_code) rows — embeddings never leave the scan task and
never enter a shuffle; queries (broadcast-scale by contract) carry their LUT
as an array column; the candidate equi-join on ivf_list moves 12 bytes of
payload per row; top-k is the standard per-query window.

Determinism/oracle: the registry variant uses closed-form codebooks
(splitmix + Box-Muller, functions/ann.py::_hyperplanes) so encode, LUT, and
ADC replay bit-for-bit in DuckDB SQL; train_pq_codebooks provides
data-adaptive codebooks for real recall (measured in pytest vs exact GEMM,
alongside the FAISS-style exact re-rank refinement).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ann import _hyperplanes, cosine_expr


def pq_codebooks(dim: int = 64, m: int = 8, ksub: int = 16, seed: int = 202) -> np.ndarray:
    """(m, ksub, dsub) deterministic codebooks — independent splitmix
    streams per subspace.  Not trained; see train_pq_codebooks."""
    assert dim % m == 0
    dsub = dim // m
    return np.stack([_hyperplanes(dsub, ksub, seed=seed + j) for j in range(m)])


def train_pq_codebooks(
    vectors: DataFrame,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_cap: int = 20_000,
    iters: int = 10,
    ivf_centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Per-subspace Lloyd k-means on a deterministic hash-ordered sample
    (same sampling contract as train_ivf_centroids): data-adaptive
    codebooks for real recall.  Pure function of the data — no RNG.
    With `ivf_centroids`, trains on coarse residuals (x - centroid), the
    distribution the residual-encoding path actually quantizes."""
    rows = (
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.hash(F.col("_id")), F.col("_id"))
        .limit(sample_cap)
        .collect()
    )
    mviews = np.vstack([np.asarray(r._v, dtype=np.float64) for r in rows])
    mviews /= np.maximum(np.linalg.norm(mviews, axis=1, keepdims=True), 1e-300)
    if ivf_centroids is not None:
        mviews = mviews - ivf_centroids[np.argmax(mviews @ ivf_centroids.T, axis=1)]
    dsub = dim // m
    books = []
    for j in range(m):
        s = mviews[:, j * dsub : (j + 1) * dsub]
        c = s[:ksub].copy()
        for _ in range(iters):
            d2 = ((s[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for t in range(ksub):
                sel = s[assign == t]
                if len(sel):
                    c[t] = sel.mean(axis=0)
        books.append(c)
    return np.stack(books)


def train_opq(
    vectors: DataFrame,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_cap: int = 20_000,
    outer_iters: int = 6,
    inner_iters: int = 4,
) -> tuple[np.ndarray, np.ndarray]:
    """OPQ (Ge et al., CVPR 2013, non-parametric): alternate between
    per-subspace k-means on the rotated sample and the orthogonal
    Procrustes solve R = U V^T of X^T Q(XR), so the learned rotation packs
    correlated dimensions into balanced subspaces before quantization —
    PQ's independence assumption holds MUCH better on rotated data.

    Returns (R, codebooks); apply via ann_ivfpq_topk(rotation=R,
    codebooks=books).  Deterministic: hash-ordered sample, k-means seeded
    from the first ksub rows, and the Procrustes product U V^T is
    sign-invariant, so R is a pure function of the data."""
    rows = (
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.hash(F.col("_id")), F.col("_id"))
        .limit(sample_cap)
        .collect()
    )
    X = np.vstack([np.asarray(r._v, dtype=np.float64) for r in rows])
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    dsub = dim // m
    R = np.eye(dim)
    books = None
    for _ in range(outer_iters):
        Y = X @ R
        books = []
        for j in range(m):
            s = Y[:, j * dsub : (j + 1) * dsub]
            c = s[:ksub].copy()
            for _ in range(inner_iters):
                d2 = ((s[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d2, axis=1)
                for t in range(ksub):
                    sel = s[assign == t]
                    if len(sel):
                        c[t] = sel.mean(axis=0)
            books.append(c)
        books = np.stack(books)
        # reconstruct the quantized rotated sample, then Procrustes
        Q = np.empty_like(Y)
        codes = _encode_batch(Y, books)
        for j in range(m):
            t = (codes >> (4 * j)) & (books.shape[1] - 1)
            Q[:, j * dsub : (j + 1) * dsub] = books[j][t]
        # orthogonal Procrustes: R = U V^T (sign-invariant — flipping a
        # matched U/V column pair cancels in the product; LAPACK SVD is
        # deterministic for a given input, so R is a pure function of X)
        U, _, Vt = np.linalg.svd(X.T @ Q)
        R = U @ Vt
    return R, books


def _encode_batch(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Packed PQ codes for normalized rows of `mat`.  Per subspace the
    argmax of (s.c - |c|^2/2) — the L2 argmin in dot form; FIRST argmax on
    ties, matching the SQL oracle's list_position."""
    m, ksub, dsub = books.shape
    codes = np.zeros(len(mat), dtype=np.int64)
    for j in range(m):
        s = mat[:, j * dsub : (j + 1) * dsub]
        score = s @ books[j].T - 0.5 * (books[j] * books[j]).sum(axis=1)[None, :]
        codes |= np.argmax(score, axis=1).astype(np.int64) << (4 * j)
    return codes


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ivf_centroids: np.ndarray | None = None,
    residual: bool = False,
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """(id, pq_code[, ivf_list]) in ONE Arrow pass — vectors are normalized,
    coarse-assigned (optional), and PQ-encoded in the same Python task, so
    embedding floats never reach the JVM side of this plan.

    `residual=True` (requires ivf_centroids) quantizes x - centroid[list]
    instead of x — FAISS IVFPQ's actual structure.  Residuals are much
    smaller than raw vectors, so the same 4 bits/subspace land far finer;
    scoring adds the q.centroid term back JVM-side (see ann_ivfpq_topk).

    `rotation` (OPQ, train_opq) rotates before everything else; queries
    rotate the same way, so all dot products are preserved exactly."""
    books = codebooks
    C = ivf_centroids
    R = rotation
    if residual and C is None:
        raise ValueError("residual encoding requires ivf_centroids")
    out_schema = f"{id_col} long, pq_code long" + (", ivf_list long" if C is not None else "")

    def kernel(batches):
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.sqrt((mat * mat).sum(axis=1, keepdims=True)), 1e-300)
            if R is not None:
                mat = mat @ R
            cols = {id_col: pdf[id_col]}
            if C is not None:
                assign = np.argmax(mat @ C.T, axis=1)
                cols["ivf_list"] = assign.astype(np.int64)
                if residual:
                    mat = mat - C[assign]
            cols["pq_code"] = _encode_batch(mat, books)
            yield pd.DataFrame(cols)[list(out_schema_cols)]

    out_schema_cols = [c.split()[0] for c in out_schema.split(", ")]
    return df.mapInPandas(kernel, schema=out_schema)


def _query_side(
    queries: DataFrame,
    codebooks: np.ndarray,
    ivf_centroids: np.ndarray,
    nprobe: int,
    qvec_col: str = "qv",
    qid_col: str = "query_id",
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """(query_id, lut: array<double>, ivf_list exploded x nprobe) — LUT[j*ksub+t]
    = dot(normalized-q subvector j, codebook[j][t]).  Queries are
    broadcast-scale by contract (same as every ANN query side here)."""
    books = codebooks
    C = ivf_centroids
    m, ksub, dsub = books.shape

    def kernel(batches):
        flat = books.reshape(m * ksub, dsub)
        for pdf in batches:
            mat = np.vstack(pdf[qvec_col].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.sqrt((mat * mat).sum(axis=1, keepdims=True)), 1e-300)
            if rotation is not None:
                mat = mat @ rotation
            luts = []
            for q in mat:
                lut = np.empty(m * ksub)
                for j in range(m):
                    lut[j * ksub : (j + 1) * ksub] = (
                        flat[j * ksub : (j + 1) * ksub] @ q[j * dsub : (j + 1) * dsub]
                    )
                luts.append(lut.tolist())
            d = mat @ C.T
            probes = np.argsort(-d, axis=1, kind="stable")[:, :nprobe]
            yield pd.DataFrame(
                {
                    qid_col: pdf[qid_col],
                    "lut": luts,
                    "probe_lists": list(probes.astype(np.int64)),
                    # q . centroid per probe — the residual-mode score base
                    "probe_qc": list(np.take_along_axis(d, probes, axis=1)),
                }
            )

    out = queries.mapInPandas(
        kernel,
        schema=(
            f"{qid_col} long, lut array<double>, "
            "probe_lists array<long>, probe_qc array<double>"
        ),
    )
    pr = F.explode(F.arrays_zip("probe_lists", "probe_qc")).alias("p")
    return (
        out.select(qid_col, "lut", pr)
        .withColumn("ivf_list", F.col("p.probe_lists"))
        .withColumn("qc", F.col("p.probe_qc"))
        .drop("p")
    )


def adc_score_expr(code_col: str, lut_col: str, m: int = 8, ksub: int = 16) -> F.Column:
    """Fixed-order (j = 0..m-1) sum of LUT lookups — pure JVM: shift/mask
    the packed code, element_at into the query's LUT array.  Left-assoc
    addition matches the oracle's explicit `t0 + t1 + ...` chain."""
    terms = [
        F.element_at(
            F.col(lut_col),
            (
                F.shiftrightunsigned(F.col(code_col), 4 * j).bitwiseAND(F.lit(ksub - 1))
                + F.lit(j * ksub + 1)
            ).cast("int"),
        )
        for j in range(m)
    ]
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return s


def ann_ivfpq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    codebooks: np.ndarray | None = None,
    ivf_centroids: np.ndarray | None = None,
    refine: int = 0,
    residual: bool = False,
    rotation: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FAISS-style IVFPQ top-k: coarse probe -> ADC scoring over packed
    codes -> per-query window.  `refine` > 0 re-ranks the top `refine` ADC
    candidates by exact cosine (joins the embeddings back for only those
    rows — the FAISS refine stage).  `residual=True` quantizes coarse
    residuals and scores q.x ~ q.centroid + q.residual~ — the q.centroid
    term rides the probe row (`qc`), the LUT is unchanged, and the plan
    stays identical (one extra double per candidate row).  Tie-breaks:
    (score DESC, id ASC)."""
    from .ann import _ivf_centroids

    books = codebooks if codebooks is not None else pq_codebooks(dim, m, ksub)
    C = ivf_centroids if ivf_centroids is not None else _ivf_centroids(dim, nlist)
    enc = pq_encode(
        vectors, books, vec_col=vec_col, id_col=id_col, ivf_centroids=C,
        residual=residual, rotation=rotation,
    )
    qs = _query_side(queries, books, C, nprobe, rotation=rotation)
    cand = enc.join(qs, on="ivf_list").filter(F.col(id_col) != F.col("query_id"))
    score = adc_score_expr("pq_code", "lut", m=m, ksub=ksub)
    if residual:
        score = score + F.col("qc")
    w = Window.partitionBy("query_id").orderBy(score.desc(), F.col(id_col).asc())
    topk = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= (refine if refine else k))
        .select("query_id", "rank", F.col(id_col).alias("neighbor_id"))
    )
    if not refine:
        return topk
    # exact re-rank of the ADC shortlist: embeddings rejoin for only
    # |Q| x refine rows
    qv = queries.select("query_id", "qv")
    vv = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    joined = topk.join(qv, on="query_id").join(vv, on="neighbor_id")
    cos = cosine_expr(F.col("nv"), F.col("qv"))
    w2 = Window.partitionBy("query_id").orderBy(cos.desc(), F.col("neighbor_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
