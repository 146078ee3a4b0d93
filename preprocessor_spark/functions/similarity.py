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
    """Deterministic pseudo-random hyperplane component in [-1, 1).

    md5-derived (hashing.py) so a SQL oracle reproduces the exact planes:
    DuckDB ``('0x'||substr(md5('plane:'||seed||':'||p||':'||d),1,15))::BIGINT
    / 2^59 - 1.0``. The 60-bit integer→double conversion and the division
    by an exact power of two round identically under IEEE-754 everywhere."""
    key = F.concat_ws(
        ":",
        F.lit("plane"),
        F.lit(str(seed)),
        F.lit(str(plane)),
        dim_idx.cast("string"),
    )
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return h / F.lit(float(2**59)) - 1.0


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
    round_digits: int | None = None,
) -> DataFrame:
    """ANN top-k: score only vectors in the query's LSH bucket. At corpus
    scale the table is written bucketed/partitioned by the signature, so
    this is a partition-pruned scan of ~n/2^planes vectors.

    ``round_digits`` rounds the cosine BEFORE the (cosine desc, id) ordering
    so the ranking is reproducible across engines whose float summation
    order differs (the oracle-comparison mode)."""
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
    cos = cosine(F.col(emb_col).cast("array<double>"), q)
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    return (
        df.withColumn("__bucket", lsh_bucket(F.col(emb_col), num_planes, seed))
        .filter(F.col("__bucket") == qbucket)
        .select(F.col(id_col), cos.alias("cosine"))
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
    nprobe nearest cells.

    Cell assignment is a single shuffle-free projection: the (tiny) centroid
    set is collected once and inlined as literal arrays, every vector scores
    all centroids in one expression and takes the argmax natively
    (array_position of array_max over the similarity array). No crossJoin,
    no per-vector window — the plan has zero Exchanges before the final
    top-k. At corpus scale the table is written partitioned by __cell so the
    probe is partition-pruned."""
    cents = (
        df.withColumn("__cell", F.abs(F.xxhash64(F.lit(seed), F.col(id_col))) % num_cells)
        .groupBy("__cell")
        .agg(F.min_by(emb_col, id_col).alias("centroid"))
        .collect()
    )
    cents.sort(key=lambda r: r["__cell"])
    cell_ids = [r["__cell"] for r in cents]
    cent_lits = [
        F.array(*[F.lit(float(x)) for x in r["centroid"]]) for r in cents
    ]
    q = F.array(*[F.lit(float(x)) for x in query])
    emb_d = F.col(emb_col).cast("array<double>")
    sims = F.array(*[cosine(emb_d, c) for c in cent_lits])
    # argmax over the literal-centroid similarity array → index into cell_ids
    cell_arr = F.array(*[F.lit(c) for c in cell_ids])
    assigned = df.withColumn(
        "__cell", F.element_at(cell_arr, F.array_position(sims, F.array_max(sims)).cast("int"))
    )
    q_sims = sorted(
        ((r["__cell"], sum(a * b for a, b in zip(r["centroid"], query))
          / ((sum(a * a for a in r["centroid"]) ** 0.5)
             * (sum(b * b for b in query) ** 0.5)))
         for r in cents),
        key=lambda t: -t[1],
    )
    probe_cells = [c for c, _ in q_sims[:nprobe]]
    return (
        assigned.filter(F.col("__cell").isin(probe_cells))
        .select(
            F.col(id_col),
            cosine(emb_d, q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )
