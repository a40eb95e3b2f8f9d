"""Approximate nearest-neighbor scale tier (SURVEY §4.3.1b).

The reference's index is Milvus IVF_FLAT: k-means coarse quantization with
nlist=128 cells, nprobe cells scanned per query (extract_and_embed.py:53-54).
Spark has no secondary indexes, but the SAME math maps onto partitioning:

  build:  fit KMeans(k=nlist) on (a sample of) the corpus → assign every
          row its nearest-centroid cluster_id (map-side, centroids
          broadcast) → write partitioned by cluster_id.
  query:  rank centroids by distance to the query vector → scan only the
          nprobe nearest partitions (partition pruning does the pruning) →
          exact distance + top-k within.

This trades recall for scan fraction exactly like IVF_FLAT (nprobe/nlist of
the data touched). At 100 TB the centroid fit runs on a bounded sample
(KMeans cost is per-row × k; the assignment pass is the only full scan),
and cluster_id doubles as the blocking key for semantic near-dedup
(operators/dedup.embedding_near_dup_pairs).

`BucketedRandomProjectionLSH` (public MLlib, Euclidean — the reference's L2
metric) is wrapped as the alternative index; both are validated against the
exact brute-force tier by recall@k in tests/test_ann.py, mirroring how the
reference's own index answers are approximate w.r.t. flat search.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.functions.vector import l2_distance
from pdf_parse_vector_db_spark.operators.knn import knn_exact


def _require_ml():
    from pyspark.ml.clustering import KMeans  # noqa: PLC0415
    from pyspark.ml.functions import array_to_vector  # noqa: PLC0415

    return KMeans, array_to_vector


@dataclass
class IVFIndex:
    """Fitted IVF state: centroid matrix (nlist × dim) + the clustered
    corpus (input columns + cluster_id). `centroids` lives on the driver —
    nlist × dim floats (128 × 1536 ≈ 786 KB at reference shape), broadcast
    implicitly through the assignment expression."""

    centroids: np.ndarray
    clustered: DataFrame
    vec_col: str

    def nearest_clusters(self, query_vec: list[float], nprobe: int) -> list[int]:
        q = np.asarray(query_vec, dtype=np.float64)
        d = ((self.centroids - q) ** 2).sum(axis=1)
        return [int(i) for i in np.argsort(d, kind="stable")[:nprobe]]

    def search(
        self,
        query_vec: list[float],
        k: int = 5,
        nprobe: int = 8,
        metric: str = "l2",
    ) -> DataFrame:
        """Probe the nprobe nearest cells, exact top-k within. The cluster_id
        IN (...) filter partition-prunes when `clustered` is read back from a
        cluster_id-partitioned table."""
        probes = self.nearest_clusters(query_vec, nprobe)
        pruned = self.clustered.filter(F.col("cluster_id").isin(probes))
        return knn_exact(pruned, query_vec, k=k, vec_col=self.vec_col, metric=metric)


def build_ivf(
    corpus: DataFrame,
    nlist: int = 128,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
) -> IVFIndex:
    """Fit the coarse quantizer and assign cluster ids.

    The assignment is a pure column expression over the broadcast centroid
    array — no UDF, no shuffle: for each row, argmin over nlist squared
    distances, evaluated in codegen. (An MLlib transform would also work but
    drags VectorUDT through the plan; the expression keeps the chunks table
    plain arrays.)"""
    KMeans, array_to_vector = _require_ml()
    fit_df = corpus if sample_fraction is None else corpus.sample(sample_fraction, seed=seed)
    km = KMeans(k=nlist, seed=seed, featuresCol="__features", predictionCol="__cluster")
    model = km.fit(fit_df.select(array_to_vector(F.col(vec_col)).alias("__features")))
    centroids = np.asarray([np.asarray(c) for c in model.clusterCenters()])

    # argmin over centroids as a fold: carry (best_id, best_dist) in a struct
    cent_lits = F.array(
        *[
            F.struct(
                F.lit(i).alias("cid"),
                F.array(*[F.lit(float(x)) for x in c]).alias("cvec"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    dist_sq = lambda cv: F.aggregate(  # noqa: E731
        F.zip_with(F.col(vec_col).cast("array<double>"), cv, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = F.aggregate(
        cent_lits,
        F.struct(F.lit(-1).alias("cid"), F.lit(float("inf")).alias("d")),
        lambda acc, c: F.when(
            dist_sq(c["cvec"]) < acc["d"],
            F.struct(c["cid"].alias("cid"), dist_sq(c["cvec"]).alias("d")),
        ).otherwise(acc),
    )
    clustered = corpus.withColumn("cluster_id", best["cid"])
    return IVFIndex(centroids=centroids, clustered=clustered, vec_col=vec_col)


def write_ivf(index: IVFIndex, path: str) -> None:
    """Persist the full index — the IVF 'build once, search many' job:
    the clustered corpus partitioned by cell (search-time cluster pruning
    becomes Parquet partition pruning, zero I/O for unprobed cells) plus
    the nlist×dim centroid table as a tiny sidecar parquet, so a later
    session reopens the index WITHOUT re-running the k-means fit (the
    reference's Milvus collection load, extract_and_embed.py:41-57, is
    this same open-by-name lifecycle)."""
    index.clustered.write.mode("overwrite").partitionBy("cluster_id").parquet(
        f"{path}/cells"
    )
    spark = index.clustered.sparkSession
    rows = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(index.centroids)
    ]
    spark.createDataFrame(rows, "cid INT, cvec ARRAY<DOUBLE>").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")


def read_ivf(spark, path: str, vec_col: str = "embedding") -> IVFIndex:
    """Reopen a persisted IVF index: centroids from the sidecar (nlist×dim
    driver floats), cells as a cluster_id-partitioned scan — so
    `search()`'s cluster_id IN (...) filter partition-prunes against the
    on-disk layout and unprobed cells are never read. No k-means re-fit,
    no full-corpus pass."""
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
    centroids = np.asarray([r.cvec for r in cent_rows], dtype=np.float64)
    clustered = spark.read.parquet(f"{path}/cells")
    return IVFIndex(centroids=centroids, clustered=clustered, vec_col=vec_col)


@dataclass
class PQIndex:
    """Product-quantization state (Jégou et al. 2011, "Product Quantization
    for Nearest Neighbor Search"): per-subspace codebooks (m × ksub × dsub,
    driver-resident — m·ksub·dsub floats ≈ 4 KB at (8,16,8)) and the
    encoded corpus, each vector compressed to m small codes. At (8,16) a
    dim-64 float32 vector shrinks 256 B → 8 B — the memory trade that lets
    a 100 TB corpus's index fit in cluster RAM while full vectors stay on
    disk for the rerank stage."""

    codebooks: np.ndarray  # (m, ksub, dsub)
    encoded: DataFrame
    vec_col: str

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    def adc_search(
        self, query_vec: list[float], k: int = 5, fetch: int = 20
    ) -> DataFrame:
        """IVFADC+R-style two stage: rank by ASYMMETRIC distance — the
        query's per-subspace distance lookup table (m × ksub, built on the
        driver, shipped as literals) summed over each row's codes, pure
        codegen over 8-byte codes — then exact-rerank the `fetch`
        over-fetched candidates on their full vectors. Only `fetch` full
        vectors are ever touched per query."""
        q = np.asarray(query_vec, dtype=np.float64)
        lut = [
            [float(((q[j * self.dsub : (j + 1) * self.dsub] - c) ** 2).sum()) for c in self.codebooks[j]]
            for j in range(self.m)
        ]
        lut_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
        contrib = F.zip_with(
            F.col("codes"), lut_lit, lambda code, row: F.element_at(row, code + 1)
        )
        adc = F.sqrt(F.aggregate(contrib, F.lit(0.0), lambda a, x: a + x))
        cands = (
            self.encoded.withColumn("__adc", adc)
            .orderBy(F.col("__adc").asc(), F.col("vec_id").asc())
            .limit(fetch)
        )
        qlit = F.array(*[F.lit(float(x)) for x in query_vec])
        return (
            cands.withColumn("score", l2_distance(F.col(self.vec_col), qlit))
            .orderBy(F.col("score").asc(), F.col("vec_id").asc())
            .limit(k)
            .drop("__adc", "codes")
        )


def build_pq(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
) -> PQIndex:
    """Fit m per-subspace KMeans codebooks (on a bounded sample at scale —
    codebook training cost is independent of corpus size) and encode every
    vector as its m nearest-centroid code ids, each an argmin fold over
    ksub centroid literals evaluated in codegen — encoding is the only
    full scan and it is map-side, no UDF, no shuffle."""
    KMeans, array_to_vector = _require_ml()
    dim = len(corpus.select(vec_col).first()[0])
    assert dim % m == 0, (dim, m)
    dsub = dim // m
    fit_df = corpus if sample_fraction is None else corpus.sample(sample_fraction, seed=seed)
    base = fit_df.select(F.col(vec_col).cast("array<double>").alias("__v"))
    books = []
    for j in range(m):
        sub = base.select(
            array_to_vector(F.slice("__v", j * dsub + 1, dsub)).alias("__features")
        )
        model = KMeans(k=ksub, seed=seed + j, featuresCol="__features").fit(sub)
        books.append(np.asarray([np.asarray(c) for c in model.clusterCenters()]))
    codebooks = np.asarray(books)

    codes = []
    for j in range(m):
        cents = F.array(
            *[
                F.struct(
                    F.lit(i).alias("cid"),
                    F.array(*[F.lit(float(x)) for x in c]).alias("cvec"),
                )
                for i, c in enumerate(codebooks[j])
            ]
        )
        sub = F.slice(F.col(vec_col).cast("array<double>"), j * dsub + 1, dsub)
        dist_sq = lambda cv, sub=sub: F.aggregate(  # noqa: E731
            F.zip_with(sub, cv, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        best = F.aggregate(
            cents,
            F.struct(F.lit(-1).alias("cid"), F.lit(float("inf")).alias("d")),
            lambda acc, c: F.when(
                dist_sq(c["cvec"]) < acc["d"],
                F.struct(c["cid"].alias("cid"), dist_sq(c["cvec"]).alias("d")),
            ).otherwise(acc),
        )
        codes.append(best["cid"])
    encoded = corpus.withColumn("codes", F.array(*codes))
    return PQIndex(codebooks=codebooks, encoded=encoded, vec_col=vec_col)


def lsh_model(corpus: DataFrame, vec_col: str = "embedding", bucket_length: float = 2.0, num_tables: int = 4, seed: int = 42):
    """Public-MLlib Euclidean LSH over the corpus; returns (model, indexed
    DataFrame with VectorUDT feature col) for approxNearestNeighbors /
    approxSimilarityJoin."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH  # noqa: PLC0415

    _, array_to_vector = _require_ml()
    feat = corpus.withColumn("__features", array_to_vector(F.col(vec_col)))
    lsh = BucketedRandomProjectionLSH(
        inputCol="__features",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_tables,
        seed=seed,
    )
    model = lsh.fit(feat)
    return model, model.transform(feat)


def recall_at_k(approx: DataFrame, exact: DataFrame, id_col: str) -> float:
    """Fraction of exact top-k ids recovered by the approximate result —
    the metric that prices the nprobe/nlist trade."""
    a = {r[0] for r in approx.select(id_col).collect()}
    e = [r[0] for r in exact.select(id_col).collect()]
    return sum(1 for x in e if x in a) / max(len(e), 1)  # ansi: Python, max >= 1
