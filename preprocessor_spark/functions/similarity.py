"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — native ``zip_with``/``aggregate`` dot
product (JVM-side, codegen), no UDF. Scale paths:
  * LSH (random hyperplanes): signature bucket per vector, search within the
    query's bucket (± multiprobe) — sublinear candidate set;
  * IVF (inverted file): k-means-lite centroid assignment, search nprobe
    nearest cells.

Hyperplanes and centroid seeds derive deterministically from hash(seed,
plane, dim) so every executor computes identical structures with no
broadcast state and results are invariant to parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector: one scan, partial
    top-k per partition via Catalyst's TakeOrderedAndProject (orderBy+limit
    never globally sorts the full table)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        df.select(
            F.col(id_col),
            cosine(F.col(emb_col).cast("array<double>"), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def _plane_component(plane: int, dim_idx: Column, seed: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1)."""
    h = F.xxhash64(F.lit(seed), F.lit(plane), dim_idx)
    return (h % 10_000_019).cast("double") / 5_000_009.5 - 1.0


def lsh_bucket(emb: Column, num_planes: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane signature: bit b = sign(dot(emb, plane_b)) packed
    into a long. Pure expressions — identical on every executor."""
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        zipped = F.zip_with(
            emb,
            F.transform(
                F.sequence(F.lit(0), F.size(emb) - 1),
                lambda i: _plane_component(p, i, seed),
            ),
            lambda x, w: x.cast("double") * w,
        )
        d = F.aggregate(zipped, F.lit(0.0), lambda acc, v: acc + v)
        sig = sig + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: score only vectors in the query's LSH bucket. At corpus
    scale the table is written bucketed/partitioned by the signature, so
    this is a partition-pruned scan of ~n/2^planes vectors."""
    # compute the query's bucket with the same deterministic expressions, on
    # a 1-row DataFrame (avoids reimplementing the hash in Python)
    spark = df.sparkSession
    qdf = spark.range(1).select(
        F.array(*[F.lit(float(x)) for x in query]).alias("q")
    )
    qbucket = qdf.select(lsh_bucket(F.col("q"), num_planes, seed).alias("b")).collect()[
        0
    ]["b"]
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        df.withColumn("__bucket", lsh_bucket(F.col(emb_col), num_planes, seed))
        .filter(F.col("__bucket") == qbucket)
        .select(
            F.col(id_col),
            cosine(F.col(emb_col).cast("array<double>"), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    num_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: centroids sampled deterministically (first vector of each
    xxhash64 bucket), vectors assigned to nearest centroid, query probes the
    nprobe nearest cells. Centroids are tiny → broadcast join."""
    cents = (
        df.withColumn("__cell", F.abs(F.xxhash64(F.lit(seed), F.col(id_col))) % num_cells)
        .groupBy("__cell")
        .agg(F.min_by(emb_col, id_col).alias("centroid"))
    )
    with_cell = (
        df.crossJoin(F.broadcast(cents))
        .withColumn(
            "__d",
            cosine(F.col(emb_col).cast("array<double>"), F.col("centroid").cast("array<double>")),
        )
        .withColumn(
            "__rk",
            F.row_number().over(Window.partitionBy(id_col).orderBy(F.desc("__d"))),
        )
        .filter(F.col("__rk") == 1)
        .select(id_col, emb_col, "__cell")
    )
    q = F.array(*[F.lit(float(x)) for x in query])
    probe_cells = [
        r["__cell"]
        for r in cents.select(
            "__cell", cosine(F.col("centroid").cast("array<double>"), q).alias("d")
        )
        .orderBy(F.desc("d"))
        .limit(nprobe)
        .collect()
    ]
    return (
        with_cell.filter(F.col("__cell").isin(probe_cells))
        .select(
            F.col(id_col),
            cosine(F.col(emb_col).cast("array<double>"), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )
