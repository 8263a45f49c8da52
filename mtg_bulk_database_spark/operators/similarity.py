"""Similarity search over embedding columns (north-star extension):
brute-force cosine top-k as the exact baseline, random-hyperplane LSH
bucketing as the scale path.

Scale design: brute force is one scan with a codegen'd cosine — correct
at any size but O(n) per query. The LSH variant prunes the scan to one
bucket (expected n/2^planes candidates): signatures are computed once at
ingest, bucket becomes the shuffle/cluster key, and queries touch only
their bucket's files (partition pruning on ``bucket``). IVF would swap
the hash for k-means centroids — same plumbing.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, indexable_vector


def _query_vec_lit(qv: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in qv])


def _rank_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Shared ranking tail for every top-k variant — one place defines
    the rounding scale and tie-break, so brute/LSH/IVF recall
    comparisons can never diverge on ordering semantics. NULL and
    zero-norm vectors are filtered here (see
    functions.vectors.indexable_vector for why they must not reach the
    cosine)."""
    sim = F.round(
        cosine_similarity(F.col(vec_col), _query_vec_lit(query_vec)), 4
    ).alias("cosine")
    return (
        df.where(indexable_vector(F.col(vec_col)))
        .select(F.col(id_col), sim)
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: scan + TakeOrderedAndProject (per-partition
    heap top-k, then driver merge — no full sort, no full shuffle)."""
    return _rank_topk(df, query_vec, k, vec_col, id_col)


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed → identical buckets
    on every run/cluster)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit_i = 1[⟨v, plane_i⟩ ≥ 0]. Pure column
    expression — computable at ingest and usable as a partition key."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec.cast("array<double>"),
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def with_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    return df.withColumn(
        "bucket", lsh_bucket(F.col(vec_col), hyperplanes(dim, n_planes, seed))
    )


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    multiprobe_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: score only vectors whose bucket is within
    ``multiprobe_hamming`` bits of the query's bucket (multi-probe
    trades recall for candidate count)."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    bucketed = df.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    qb = 0
    for i, plane in enumerate(planes):
        if float(np.dot(query_vec, plane)) >= 0:
            qb |= 1 << i
    probe = F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qb))) <= multiprobe_hamming
    return _rank_topk(bucketed.filter(probe), query_vec, k, vec_col, id_col)


# ---------------------------------------------------------------------------
# Scalar quantization: 4× smaller vectors for the ANN scan path.
# ---------------------------------------------------------------------------


def with_quantized_embedding(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 scalar quantization: qᵢ = ⌊vᵢ·(127/max|v|) + ½⌋,
    stored with the per-vector ``q_scale`` needed to dequantize. The
    compressed column is what a 100 TB ANN deployment scans — 4× less
    I/O and memory than float32 at a recall cost the tests pin.

    Determinism: ⌊x + ½⌋ (not round()) — half-even vs half-away tie
    rules differ across engines, floor doesn't, so the oracle matches
    bit-for-bit. All-zero vectors quantize to zeros with scale 1.
    Pure columnar (two HOF passes, codegen'd), no shuffle.
    """
    vd = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(vd, lambda x: F.abs(x)))
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(1.0))
    # let-bind the scale so it computes once per row, not once per element
    qvec = F.element_at(
        F.transform(
            F.array(scale),
            lambda s: F.transform(
                vd, lambda x: F.floor(x * s + F.lit(0.5)).cast("int")
            ),
        ),
        1,
    )
    # scale is a single IEEE division (127/max) — bit-identical in any
    # engine, so it's stored unrounded
    return df.withColumn("q_embedding", qvec).withColumn("q_scale", scale)


def dequantize(q_col: Column, scale_col: Column) -> Column:
    """array<double> reconstruction: vᵢ ≈ qᵢ / scale."""
    return F.element_at(
        F.transform(
            F.array(scale_col),
            lambda s: F.transform(q_col, lambda q: q.cast("double") / s),
        ),
        1,
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means centroids as the coarse quantizer.
# ---------------------------------------------------------------------------


def ivf_index(
    df: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 8,
    train_per_list: int = 256,
):
    """Train the coarse quantizer and assign every vector to its nearest
    centroid. Returns (assigned_df, centroids). At scale the assigned
    table is written partitioned/clustered by ``list_id`` so a probe
    scans only its lists' files — same plumbing as the LSH bucket, but
    data-adaptive (centroids follow the distribution, hyperplanes
    don't).

    Vectors are L2-normalized before clustering (spherical k-means):
    the final ranking metric is cosine, and Euclidean k-means over raw
    magnitudes would put same-direction/different-norm vectors in
    different lists — a probe-stage metric mismatch that silently costs
    recall. On the unit sphere, L2 order ≡ cosine order.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from ..functions.vectors import l2_norm

    # NULL embeddings (failed-embedder rows) cannot be indexed — drop
    # them here, mirroring how NULL similarity scores fall out of the
    # brute-force top-k (array_to_vector NPEs on a null array otherwise)
    df = df.where(indexable_vector(F.col(vec_col)))
    vec_dbl = F.col(vec_col).cast("array<double>")
    unit = F.element_at(
        F.transform(
            F.array(l2_norm(vec_dbl)),
            lambda n: F.transform(vec_dbl, lambda x: x / n),
        ),
        1,
    )
    # cache across the k-means iterations: fit() makes max_iter passes
    # and without it every pass re-reads parquet and re-normalizes.
    # k-means|| init is kept (random init measurably costs recall: 0.5
    # vs 0.7 @probe=3 on the test corpus); max_iter bounds the Lloyd
    # refinement — a coarse quantizer converges in a handful of rounds
    # and ANN recall beyond that is probe-count-dominated.
    with_vec = df.withColumn("_features", array_to_vector(unit)).cache()
    # The quantizer trains on a SAMPLE, not the full table (the FAISS
    # convention: ~256 train vectors per list) — at 100 TB, max_iter
    # full-table Lloyd passes would dominate the whole index build,
    # and centroids from a representative sample are statistically
    # equivalent for a COARSE quantizer. The sample is a deterministic
    # hash filter on the vector bytes (engine- and partitioning-
    # independent, unlike Bernoulli sample()), coalesced to a few
    # partitions so each Lloyd pass is a handful of tasks instead of a
    # full task wave per iteration (measured ~25% off the build at
    # sf0.1 after the scan fan-out raised input parallelism).
    total = with_vec.count()  # also primes the cache for fit/transform
    target = train_per_list * n_lists
    if total > target:
        # ppm granularity: a per-mille floor would pin the rate at
        # 1/1000 and sample total/1000 rows however small the target
        ppm = max(1, int(1_000_000 * target / total))
        train = with_vec.filter(
            F.pmod(F.xxhash64(vec_col), F.lit(1_000_000)) < F.lit(ppm)
        )
    else:
        train = with_vec
    train = train.coalesce(max(1, min(32, target // 1024)))
    km = KMeans(
        k=n_lists,
        seed=seed,
        featuresCol="_features",
        predictionCol="list_id",
        maxIter=max_iter,
    )
    model = km.fit(train)
    assigned = model.transform(with_vec).drop("_features")
    # materialize the assignment before releasing the feature cache so
    # downstream probes don't silently recompute the k-means input
    assigned = assigned.localCheckpoint(eager=True)
    with_vec.unpersist()
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the ``n_probe`` lists whose centroids are closest to the
    *normalized* query (driver-side: centroid table is tiny by
    construction), then exact cosine over only those lists' vectors.
    The query is unit-normalized to match the spherical index."""
    q = np.asarray(query_vec, dtype=float)
    q = q / (np.linalg.norm(q) or 1.0)
    dists = [float(np.linalg.norm(q - np.asarray(c))) for c in centroids]
    probe_lists = [i for i, _ in sorted(enumerate(dists), key=lambda t: t[1])[:n_probe]]
    return _rank_topk(
        assigned.filter(F.col("list_id").isin(probe_lists)),
        query_vec,
        k,
        vec_col,
        id_col,
    )


def quantized_refine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    refine: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage ANN over scalar-quantized vectors (the SQ+refine
    pattern every production vector store ships): the coarse pass ranks
    DEQUANTIZED int8 vectors and keeps ``k*refine`` candidates, the
    refine pass rescores only those with the full-precision column and
    returns the exact-ranked top k.

    Scale shape: at 100 TB the quantized column is the stored artifact
    (4× less scan I/O than float32 — ``with_quantized_embedding`` runs
    at ingest); the coarse pass is a TakeOrderedAndProject over that
    narrow scan, and the refine join touches ``k*refine`` rows — a
    broadcast join by construction, so full-precision vectors for only
    ~50 ids ever move. Recall loss is bounded by the quantization error
    the recall tests pin; refine=5 recovers ordering inversions within
    the candidate band.
    """
    q = with_quantized_embedding(df, vec_col)
    coarse = _rank_topk(
        q.withColumn("_deq", dequantize(F.col("q_embedding"), F.col("q_scale"))),
        query_vec,
        k * refine,
        "_deq",
        id_col,
    ).select(id_col)
    refined = df.join(F.broadcast(coarse), on=id_col)
    return _rank_topk(refined, query_vec, k, vec_col, id_col)


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN: m 4-bit sub-codes per vector + ADC probe.
# ---------------------------------------------------------------------------


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    train_per_centroid: int = 64,
    max_iter: int = 10,
) -> list[list[list[float]]]:
    """Train PQ codebooks (Jégou et al., "Product Quantization for
    Nearest Neighbor Search"): split each L2-normalized vector into
    ``m`` sub-vectors and run k-means with ``k`` centroids per
    subspace. Returns ``m × k × (dim/m)`` nested lists (a plain JSON-
    serializable ingest artifact, like the IVF centroids).

    Scale shape: training follows the FAISS convention — a BOUNDED,
    deterministic hash-sample (~``k * train_per_centroid`` vectors,
    i.e. a few thousand rows however big the table is) is collected to
    the driver and Lloyd runs in numpy there. The artifact is tiny
    (m·k·dim/m floats); the expensive parts (encode, probe) stay
    distributed. Deterministic: hash-filter sample, seeded init, fixed
    iteration count — no RNG draws depend on partitioning.
    """
    target = k * train_per_centroid
    df = df.where(indexable_vector(F.col(vec_col)))  # un-indexable rows (see ivf)
    total = df.count()
    pool = df.select(F.col(vec_col).cast("array<double>").alias("v"))
    if total > target:
        # ppm granularity (driver-collect bound): see ivf sampler above
        ppm = max(1, int(1_000_000 * target / total))
        pool = pool.filter(
            F.pmod(
                F.xxhash64(F.col("v").cast("array<float>")),
                F.lit(1_000_000),
            )
            < F.lit(ppm)
        )
    sample = np.asarray([r["v"] for r in pool.collect()], dtype=np.float64)
    if sample.ndim != 2 or sample.shape[0] < k:
        raise ValueError(
            f"PQ training needs ≥{k} sampled vectors, got {sample.shape}"
        )
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sample = sample / norms
    sub_dim = dim // m
    rng = np.random.RandomState(seed)
    codebooks: list[list[list[float]]] = []
    for j in range(m):
        sub = sample[:, j * sub_dim : (j + 1) * sub_dim]
        # seeded Lloyd with farthest-point-flavored init (k-means++ lite)
        cents = sub[rng.choice(sub.shape[0], size=k, replace=False)].copy()
        for _ in range(max_iter):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
                else:  # re-seed an empty cluster on the farthest point
                    cents[c] = sub[d2.min(axis=1).argmax()]
        codebooks.append(cents.tolist())
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Assign each vector its ``m`` nearest-sub-centroid codes
    (array<int>, values in [0, k)) — dim·4 bytes shrink to m·½ bytes of
    payload (m 4-bit codes when k=16): a 32× smaller scan artifact than
    float32 for dim=64/m=8.

    Arrow-batched pandas UDF: the argmin-over-centroids kernel is dense
    numeric linear algebra (a (batch × k × sub_dim) broadcast) with no
    relational shape — the same justification as SimHash's bit kernel.
    Runs at ingest; the probe reads only the code column.
    """
    from pyspark.sql.functions import pandas_udf

    books = np.asarray(codebooks, dtype=np.float64)  # (m, k, sub_dim)
    m, _, sub_dim = books.shape

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            if v is None:
                out.append(None)
                continue
            x = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(x)
            x = x / (n or 1.0)
            codes = [
                int(
                    (
                        (
                            (x[j * sub_dim : (j + 1) * sub_dim] - books[j])
                            ** 2
                        ).sum(axis=1)
                    ).argmin()
                )
                for j in range(m)
            ]
            out.append(codes)
        return pd.Series(out)

    return df.withColumn(code_col, encode(F.col(vec_col)))


def pq_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: Sequence[float],
    k: int = 10,
    refine: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Asymmetric-distance (ADC) probe + exact refine: the query is NOT
    quantized — per subspace a k-entry lookup table of
    ⟨q_j, centroid_{j,c}⟩ inner products is folded into the plan as
    literals, and each row's approximate cosine is m ``element_at``
    picks summed in whole-stage codegen (no UDF on the scan path). The
    top ``k*refine`` candidates are rescored exactly on the full-
    precision column via a broadcast self-join, so only ~k·refine
    full vectors ever move.

    100 TB shape: the scan that ranks 10¹¹ vectors reads only
    (id, pq_code) — m·4 bits per row — off parquet; everything wide
    stays behind the broadcast. That is the memory/IO story that makes
    PQ the standard billion-scale ANN layout.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    books = np.asarray(codebooks, dtype=np.float64)
    m, kk, sub_dim = books.shape
    # LUT[j][c] = ⟨q_j, centroid_{j,c}⟩ ; approx cos(q, v) = Σ_j LUT[j][code_j]
    lut = [
        [float(np.dot(q[j * sub_dim : (j + 1) * sub_dim], books[j][c])) for c in range(kk)]
        for j in range(m)
    ]
    score = F.lit(0.0)
    for j in range(m):
        row = F.array(*[F.lit(v) for v in lut[j]])
        idx = (F.element_at(F.col(code_col), j + 1) + F.lit(1)).cast("int")
        score = score + F.element_at(row, idx)
    coarse = (
        encoded.select(F.col(id_col), score.alias("_adc"))
        .orderBy(F.col("_adc").desc(), F.col(id_col))
        .limit(k * refine)
        .select(id_col)
    )
    refined = encoded.join(F.broadcast(coarse), on=id_col)
    return _rank_topk(refined, query_vec, k, vec_col, id_col)
