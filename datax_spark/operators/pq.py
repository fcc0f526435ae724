"""Product quantization (PQ) ANN — the memory-compression scale path.

At 100 TB of embeddings the working set, not the matmul, is the
bottleneck: a 768-dim float32 vector is 3 KB, while its PQ code is
``m`` bytes (one centroid index per subspace — 32-384× compression), so
the candidate scan runs over codes that fit in memory and touches raw
vectors only for an optional exact rerank. Classic IVF-PQ decomposition
[Jégou, Douze, Schmid 2011, "Product quantization for nearest neighbor
search"]: split each vector into ``m`` subvectors, quantize each
against a per-subspace codebook of ``n_codes`` centroids, and answer
queries with asymmetric distance computation (ADC): per query build a
lookup table LUT[j][c] = ||q_j − C_j[c]||², then every corpus code
scores in m table lookups.

Engine shape (mirrors ``similarity.py::cosine_topk_pandas``): encode +
ADC scoring fuse into ONE ``mapInPandas`` pass over the corpus (numpy
per Arrow batch, codebooks broadcast as a closure constant); each batch
emits only its LOCAL top-k per query under the global
(adc asc, id asc) order, so the exchange carries ≤ k·Q rows per batch.

Codebooks: ``train_codebooks`` runs deterministic per-subspace k-means
(production path, pytest-verified); the oracle-checked default derives
seed codebooks from the ``n_codes`` lowest-id corpus vectors — the same
self-contained-determinism pattern as ``cosine_topk_ivf``'s seed
centroids, reproducible by the pure-python reference without
replicating float training.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F, types as T

from datax_spark.operators.util import rebalance_for_cpu


def _as_matrix(pdf_col) -> np.ndarray:
    return np.stack(pdf_col.to_numpy()).astype("float64")


def _collect_matrix(corpus: DataFrame, limit: int, id_col: str, vec_col: str,
                    m: int) -> np.ndarray:
    """Driver collect of the ``limit`` lowest-id vectors as a float64
    matrix, validating that ``m`` divides the dimension."""
    rows = (corpus.select(id_col, vec_col).orderBy(F.asc(id_col))
            .limit(limit).collect())
    mat = np.array([[float(x) for x in r[vec_col]] for r in rows], dtype="float64")
    if len(mat) and mat.shape[1] % m:
        raise ValueError(f"dim {mat.shape[1]} not divisible by m={m}")
    return mat


def _encode_batch(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) centroid indices: per-subspace L2 argmin (ties -> lowest
    centroid index). The ONE implementation both the standalone encoder
    and the fused ADC scorer use — their codes must never diverge."""
    m, _n_codes, sub = books.shape
    codes = np.empty((len(X), m), dtype="int64")
    for j in range(m):
        Xj = X[:, j * sub:(j + 1) * sub]
        D = ((Xj[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = D.argmin(axis=1)
    return codes


def seed_codebooks(corpus: DataFrame, m: int, n_codes: int,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """(m, n_codes, dim/m) codebooks from the n_codes lowest-id vectors —
    deterministic, tiny driver collect (mirrors IVF's seed centroids)."""
    mat = _collect_matrix(corpus, n_codes, id_col, vec_col, m)
    if len(mat) < n_codes:
        raise ValueError(f"need >= {n_codes} corpus vectors for seeds, have {len(mat)}")
    sub = mat.shape[1] // m
    return np.stack([mat[:, j * sub:(j + 1) * sub] for j in range(m)])


def train_codebooks(
    corpus: DataFrame, m: int, n_codes: int, sample_size: int = 4096,
    iters: int = 10, id_col: str = "vec_id", vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic per-subspace k-means (no RNG: the sample is the
    ``sample_size`` lowest-id vectors, init is farthest-point seeding
    from the first vector, float64 means) — same discipline as the IVF
    trainer, so repeated runs and repartitionings give identical
    codebooks. Offline/periodic in production; encode cost is unchanged
    whichever codebooks are used."""
    mat = _collect_matrix(corpus, sample_size, id_col, vec_col, m)
    sub = mat.shape[1] // m
    books = []
    for j in range(m):
        X = mat[:, j * sub:(j + 1) * sub]
        # farthest-point init
        cents = [X[0]]
        d2 = ((X - cents[0]) ** 2).sum(axis=1)
        while len(cents) < n_codes:
            i = int(np.argmax(d2))
            cents.append(X[i])
            d2 = np.minimum(d2, ((X - cents[-1]) ** 2).sum(axis=1))
        C = np.stack(cents)
        for _ in range(iters):
            D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = D.argmin(axis=1)
            for c in range(n_codes):
                mask = assign == c
                if mask.any():
                    C[c] = X[mask].mean(axis=0)
        books.append(C)
    return np.stack(books)


def encode(corpus: DataFrame, codebooks: np.ndarray,
           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int>) — one argmin per subspace per row, numpy
    per Arrow batch; ties resolve to the lowest centroid index."""
    m, n_codes, sub = codebooks.shape
    books = codebooks.copy()
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ])

    def run(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            codes = _encode_batch(_as_matrix(pdf[vec_col]), books).astype("int32")
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "codes": list(codes)})

    # per-row numpy work: spread a narrow (often single-file) scan first
    return rebalance_for_cpu(corpus.select(id_col, vec_col)).mapInPandas(run, schema)


def pq_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, m: int = 8,
    n_codes: int = 16, codebooks: np.ndarray | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding",
    qid_col: str = "qid", qvec_col: str = "qvec", round_to: int = 4,
) -> DataFrame:
    """ADC top-k: (qid, id, adc_dist, rank) under (dist asc, id asc).
    Encode + score fuse into one corpus pass; per-batch local top-k
    bounds the exchange at k·Q rows per batch."""
    if codebooks is None:
        codebooks = seed_codebooks(corpus, m, n_codes, id_col, vec_col)
    m, n_codes, sub = codebooks.shape
    books = codebooks.copy()
    qpd = queries.select(qid_col, qvec_col).toPandas()
    qids = qpd[qid_col].to_numpy()
    Q = _as_matrix(qpd[qvec_col])
    # LUT[q][j][c] = ||q_j - C_j[c]||^2
    lut = np.empty((len(qids), m, n_codes), dtype="float64")
    for j in range(m):
        Qj = Q[:, j * sub:(j + 1) * sub]
        lut[:, j, :] = ((Qj[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)

    schema = T.StructType([
        T.StructField("qid", T.LongType()),
        T.StructField(id_col, T.LongType()),
        T.StructField("adc_dist", T.DoubleType()),
    ])

    def run(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            X = _as_matrix(pdf[vec_col])
            n = len(X)
            codes = _encode_batch(X, books)
            ids = pdf[id_col].to_numpy()
            take = min(k, n)
            out_q, out_i, out_d = [], [], []
            for qi in range(len(qids)):
                # sequential j-order accumulation (oracle-reproducible)
                dist = np.zeros(n, dtype="float64")
                for j in range(m):
                    dist += lut[qi, j, codes[:, j]]
                dist = np.round(dist, round_to)
                order = np.lexsort((ids, dist))[:take]
                out_q.append(np.full(take, qids[qi]))
                out_i.append(ids[order])
                out_d.append(dist[order])
            yield pd.DataFrame({"qid": np.concatenate(out_q),
                                id_col: np.concatenate(out_i),
                                "adc_dist": np.concatenate(out_d)})

    scored = rebalance_for_cpu(corpus.select(id_col, vec_col)).mapInPandas(run, schema)
    w = Window.partitionBy("qid").orderBy(F.asc("adc_dist"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def pq_recall(
    corpus: DataFrame, queries: DataFrame, k: int = 10, m: int = 8,
    n_codes: int = 16, codebooks: np.ndarray | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding",
    qid_col: str = "qid", qvec_col: str = "qvec",
) -> float:
    """recall@k of ADC ranking vs exact L2 — the acceptance metric that
    ships WITH the approximate operator (same discipline as
    ``lsh_recall``)."""
    approx = pq_topk(corpus, queries, k=k, m=m, n_codes=n_codes,
                     codebooks=codebooks, id_col=id_col, vec_col=vec_col,
                     qid_col=qid_col, qvec_col=qvec_col)
    q = queries.select(F.col(qid_col).alias("qid"), F.col(qvec_col).alias("_qv"))
    joined = rebalance_for_cpu(corpus.select(id_col, vec_col)).crossJoin(F.broadcast(q))
    l2 = F.sqrt(F.aggregate(
        F.zip_with(F.col(vec_col), F.col("_qv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x))
    w = Window.partitionBy("qid").orderBy(F.asc("_l2"), F.asc(id_col))
    exact = (joined.withColumn("_l2", l2)
             .withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= k).select("qid", id_col))
    hit = approx.select("qid", id_col).intersect(exact).count()
    denom = exact.count()
    return hit / denom if denom else 0.0
