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

import pandas as pd
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
    # try_divide: a zero-norm vector (padding row, failed encode) yields a
    # NULL cosine — dropped by top-k ordering (DESC is NULLS LAST) and by
    # every threshold filter — instead of an ANSI DIVIDE_BY_ZERO that kills
    # the whole job on one degenerate row
    return F.try_divide(dot(a, b), norm(a) * norm(b))


# ---------------------------------------------- codegen (static-dim) variants
# Spark's higher-order functions (zip_with / aggregate / transform) run on
# the INTERPRETED expression path — per-element closure dispatch, outside
# whole-stage codegen. When the embedding dimension is statically known
# (the normal case: a corpus has one dim), an unrolled sum of get()
# products is pure codegen arithmetic (get(), 0-based and NULL on
# out-of-bounds, over ANSI element_at: the latter emits a throw branch +
# error-context reference PER TERM under Spark 4's default ANSI mode,
# which blew janino's 64KB method limit at 4 tables x 16 planes x 16
# dims and knocked the stage out of whole-stage codegen), ~an order of magnitude cheaper per
# pair. The summation is the same left-to-right fold as dot()/norm(), so
# results are bit-identical (the only divergence is the sign of a -0.0
# total, which no downstream comparison can observe).
#
# The unrolled expression is built as ONE SQL string through F.expr, not by
# composing Column objects: each Column arithmetic op is a py4j round trip,
# and 3 × 64-term trees measured 5+ seconds of pure driver-side chatter —
# the string parse is ~4 ms. Operands may be passed as SQL strings (column
# names or expressions) to take the string path; Column operands are built
# through the Column API (bit-identical, slower to construct).


def _sql_operand(c: Column | str) -> str | None:
    # Only plain strings take the inline-SQL fast path. Stringifying a
    # Column via the private _jc.expr().sql() can produce SQL that
    # re-parses fine but RESOLVES against a different scope (a Column
    # carrying an alias/qualifier from another DataFrame) — a wrong-column
    # binding, not an exception, so no fallback would catch it. Column
    # operands always go through the Column-API builder instead: same
    # arithmetic, bit-identical result, just py4j build cost ∝ dim.
    #
    # Plain identifiers are backtick-quoted so reserved words ('order')
    # parse and so the name can never be re-tokenized. Anything else is BY
    # CONTRACT an SQL expression — a column literally NAMED 'a-b' or 'a.b'
    # must be passed as F.col('a-b') (the Column path binds it exactly).
    if not isinstance(c, str):
        return None
    import re

    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c):
        return f"`{c}`"
    return c


def _dot_inline_cols(a: Column, b: Column, dim: int) -> Column:
    terms = [
        F.get(a, i).cast("double") * F.get(b, i).cast("double")
        for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _as_col(c: Column | str) -> Column:
    return F.expr(c) if isinstance(c, str) else c


def dot_inline(a: Column | str, b: Column | str, dim: int) -> Column:
    sa, sb = _sql_operand(a), _sql_operand(b)
    if sa is None or sb is None:
        return _dot_inline_cols(_as_col(a), _as_col(b), dim)
    return F.expr(
        " + ".join(
            f"(CAST(get(({sa}), {i}) AS DOUBLE)"
            f" * CAST(get(({sb}), {i}) AS DOUBLE))"
            for i in range(dim)
        )
    )


def norm_inline(a: Column | str, dim: int) -> Column:
    return F.sqrt(dot_inline(a, a, dim))


def dot_query_inline(emb: Column | str, query: list[float]) -> Column:
    """Unrolled dot product against a LITERAL query vector: each component
    is inlined as a scalar literal. (Inlining the query as an array literal
    instead — ``get(array(...64 casts...), i)`` per term — replicates
    the array 64×, and the megabyte parse/analyze cost dominated the whole
    query; scalar literals keep the tree ~1 node per term.)"""
    e_sql = _sql_operand(emb)
    if e_sql is None:
        emb_c = _as_col(emb)
        terms = [
            F.get(emb_c, i).cast("double") * F.lit(float(x))
            for i, x in enumerate(query)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.expr(
        " + ".join(
            f"(CAST(get(({e_sql}), {i}) AS DOUBLE)"
            f" * CAST('{float(x)!r}' AS DOUBLE))"
            for i, x in enumerate(query)
        )
    )


def _py_fold_dot(a: list[float], b: list[float]) -> float:
    """Left-associative sequential double fold — the same order as
    dot()/dot_inline(), so CPython reproduces Spark's value bit-for-bit
    (IEEE-754 ops are deterministic given order)."""
    out = None
    for x, y in zip(a, b):
        t = float(x) * float(y)
        out = t if out is None else out + t
    return out


def py_lsh_bucket(query: list[float], num_planes: int, seed: int) -> int:
    """Python twin of lsh_bucket for a known query vector: same weights
    (_plane_weight), same fold order, same sign rule — bit-identical to
    evaluating the Spark expression on a 1-row DataFrame, without a job."""
    sig = 0
    for p in range(num_planes):
        d = _py_fold_dot(
            query, [_plane_weight(p, i, seed) for i in range(len(query))]
        )
        if d > 0:
            sig |= 1 << p
    return sig


def cosine_inline(a: Column | str, b: Column | str, dim: int) -> Column:
    return F.try_divide(
        dot_inline(a, b, dim), norm_inline(a, dim) * norm_inline(b, dim)
    )


def validate_dim(df: DataFrame, emb_col: str, dim: int) -> None:
    """Fail fast when a caller-declared embedding dimension disagrees with
    the data. The unrolled codegen paths index ``get(emb, 0..dim-1)``,
    and an out-of-range index returns NULL — a
    too-large ``dim`` NULL-poisons every cosine (near-dup joins silently
    return ZERO pairs) and a too-small one silently truncates the dot
    product. One LIMIT-1 scan of a sampled row is negligible next to the
    join it guards; a whole-corpus assert would pay per-row cost forever."""
    row = (
        df.select(F.size(F.col(emb_col)).alias("__n"))
        .where(F.col(emb_col).isNotNull())
        .first()
    )
    if row is not None and row["__n"] != dim:
        raise ValueError(
            f"dim={dim} does not match {emb_col!r} arrays of length "
            f"{row['__n']}: get() past the end would return NULL "
            "(poisoning every cosine) and a short dim silently truncates"
        )


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
    # zip_with stops at the shorter array, so a query/corpus dim mismatch
    # would silently truncate every dot product — fail fast instead
    validate_dim(df, emb_col, len(query))
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


def _plane_weight(plane: int, dim_idx: int, seed: int) -> float:
    """Python twin of :func:`_plane_component`, bit-identical: CPython and
    the JVM both round the 60-bit md5-substring integer to double with
    round-to-nearest-even, and the division by 2^59 is an exact binary
    scaling — so precomputing the weights driver-side changes nothing in
    the signature, it only moves 64 md5 evaluations per (row, plane) out
    of the per-row hot path."""
    import hashlib

    key = f"plane:{seed}:{plane}:{dim_idx}"
    h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
    return h / float(2**59) - 1.0


def lsh_bucket(
    emb: Column | str,
    num_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> Column:
    """Random-hyperplane signature: bit b = sign(dot(emb, plane_b)) packed
    into a long. Pure expressions — identical on every executor.

    With ``dim`` given (the normal case — one corpus, one dimension) the
    plane weights are md5-derived ONCE on the driver and inlined as
    literals in an unrolled codegen dot product; the dynamic-dim fallback
    recomputes ``num_planes × dim`` md5 hashes per row on the interpreted
    HOF path — correct, but ~two orders of magnitude more per-row work."""
    if dim is not None:
        e_sql = _sql_operand(emb)
        if e_sql is not None:
            # weights inlined as CAST('<repr>' AS DOUBLE): repr() is the
            # shortest round-tripping decimal, and both Java and CPython
            # parse it back to the identical double
            parts = []
            for p in range(num_planes):
                d = " + ".join(
                    f"(CAST(get(({e_sql}), {i}) AS DOUBLE)"
                    f" * CAST('{_plane_weight(p, i, seed)!r}' AS DOUBLE))"
                    for i in range(dim)
                )
                parts.append(
                    f"(CASE WHEN ({d}) > 0D THEN {1 << p}L ELSE 0L END)"
                )
            return F.expr("CAST((" + " + ".join(parts) + ") AS BIGINT)")
        # Connect Column fallback: same arithmetic via the Column API
        sig = F.lit(0).cast("long")
        emb_c = _as_col(emb)
        for p in range(num_planes):
            terms = [
                F.get(emb_c, i).cast("double")
                * F.lit(_plane_weight(p, i, seed))
                for i in range(dim)
            ]
            d = terms[0]
            for t in terms[1:]:
                d = d + t
            sig = sig + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
        return sig
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


def lsh_plane_bits(
    emb: Column | str,
    num_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> list[Column]:
    """Per-plane signature bits: element p is ``sign(dot(emb, plane_p))
    << p`` as a long, so summing the list reproduces :func:`lsh_bucket`
    EXACTLY (long addition is exact and order-free; each plane's dot keeps
    the same left-to-right fold). Callers that project each plane as its
    own column keep every generated method a ~dim-term sum — a packed
    num_planes × dim signature is ONE codegen unit, and past ~200 terms it
    overflows janino's 64 KB method limit, dropping its stage out of
    whole-stage codegen (worst inside a Generate node, whose generator is
    evaluated interpreted in unfused mode — see embedding_bucket_keys)."""
    if dim is None:
        raise ValueError("lsh_plane_bits requires a static dim")
    e_sql = _sql_operand(emb)
    out: list[Column] = []
    if e_sql is not None:
        for p in range(num_planes):
            d = " + ".join(
                f"(CAST(get(({e_sql}), {i}) AS DOUBLE)"
                f" * CAST('{_plane_weight(p, i, seed)!r}' AS DOUBLE))"
                for i in range(dim)
            )
            out.append(
                F.expr(f"(CASE WHEN ({d}) > 0D THEN {1 << p}L ELSE 0L END)")
            )
        return out
    emb_c = _as_col(emb)
    for p in range(num_planes):
        terms = [
            F.get(emb_c, i).cast("double") * F.lit(_plane_weight(p, i, seed))
            for i in range(dim)
        ]
        d = terms[0]
        for t in terms[1:]:
            d = d + t
        out.append(
            F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
        )
    return out


# How many inline multiply-add terms one signature may carry before the
# Arrow path takes over: past ~200-500 terms the generated stage overflows
# janino's 64 KB method limit, Spark burns seconds ATTEMPTING the doomed
# compile on every action, then evaluates the whole stage on the
# interpreted per-node path (~1 ms/row at 512 terms — 30+ CPU-hours per
# 10^8 rows). The Arrow path is one fused numpy multiply-add per dim
# (~0.2 µs/row) and is bit-identical, so the crossover is generous.
LSH_INLINE_TERM_LIMIT = 192


def lsh_bucket_arrow(
    emb: Column | str,
    num_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> Column:
    """Vectorized Arrow twin of :func:`lsh_bucket` for large dim×planes
    products — a scalar pandas UDF whose weight matrix is precomputed on
    the driver from the SAME ``_plane_weight`` md5 constants.

    Bit-identical to the inline path by construction: float32 elements
    widen to float64 before multiplying (numpy ``astype`` == SQL CAST),
    the dim fold accumulates in the same left-to-right order (one
    vectorized ``acc += e_i · w_i`` per dimension — order per element is
    ascending i, exactly the inline sum's association), the sign rule is
    the same strict ``> 0``, and NULL / wrong-length embeddings yield
    signature 0 (the inline CASE's NULL-dot result). The leading +0.0 in
    the accumulator cannot flip a sign: it only rewrites -0.0 totals to
    +0.0, and neither satisfies ``> 0``."""
    if dim is None:
        raise ValueError("lsh_bucket_arrow requires a static dim")
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    W = np.empty((dim, num_planes), dtype=np.float64)
    for p in range(num_planes):
        for i in range(dim):
            W[i, p] = _plane_weight(p, i, seed)
    powers = 1 << np.arange(num_planes, dtype=np.int64)

    @pandas_udf("long")
    def _sig(col: pd.Series) -> pd.Series:
        n = len(col)
        if n == 0:
            return pd.Series([], dtype="int64")
        ok = col.map(lambda v: v is not None and len(v) == dim)
        E = np.zeros((n, dim), dtype=np.float64)
        if ok.any():
            E[np.asarray(ok.values, dtype=bool)] = np.stack(
                [np.asarray(v, dtype=np.float64) for v in col[ok]]
            )
        acc = np.zeros((n, num_planes), dtype=np.float64)
        for i in range(dim):
            acc += E[:, i : i + 1] * W[i]
        bv = ((acc > 0).astype(np.int64) * powers).sum(axis=1)
        return pd.Series(bv, index=col.index)

    return _sig(_as_col(emb))


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
    import math

    # the query's bucket and norm are driver-side constants: py_lsh_bucket /
    # _py_fold_dot replay Spark's exact fold order, so no 1-row Spark job
    # (and no duplicated sign logic that could drift)
    dim = len(query)
    # the unrolled get(emb, 0..dim-1) paths silently truncate on a short
    # query and NULL-poison (signature 0, empty/garbage top-k) on a long
    # one — same failure mode validate_dim guards in embedding_near_dups
    validate_dim(df, emb_col, dim)
    qbucket = py_lsh_bucket(list(query), num_planes, seed)
    q_norm = math.sqrt(_py_fold_dot(query, query))
    if dim <= LSH_INLINE_TERM_LIMIT:
        cos = F.try_divide(
            dot_query_inline(emb_col, list(query)),
            norm_inline(emb_col, dim) * F.lit(q_norm),
        )
    else:
        # inline scoring past the term budget hits the janino 64 KB cliff
        # (doomed compile, then whole-stage interpreted fallback): score via
        # the HOF dot against ONE array literal instead — same left-fold
        # summation order over double-cast elements, so values match the
        # inline form bit-for-bit; runs only on the bucket-pruned subset
        qlit = F.array(*[F.lit(float(x)) for x in query])
        embd = F.col(emb_col).cast("array<double>")
        cos = F.try_divide(dot(embd, qlit), norm(embd) * F.lit(q_norm))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    sig = (
        lsh_bucket_arrow(emb_col, num_planes, seed, dim=dim)
        if dim * num_planes > LSH_INLINE_TERM_LIMIT
        else lsh_bucket(emb_col, num_planes, seed, dim=dim)
    )
    return (
        df.withColumn("__bucket", sig)
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
    validate_dim(df, emb_col, len(query))  # zip truncation, as in brute force
    cents = (
        df.withColumn("__cell", F.abs(F.xxhash64(F.lit(seed), F.col(id_col))) % num_cells)
        .groupBy("__cell")
        .agg(F.min_by(emb_col, id_col).alias("centroid"))
        .collect()
    )
    # a cell whose min_by row has a NULL embedding yields centroid=None —
    # skip it (its members re-assign to the nearest real centroid) instead
    # of a driver TypeError on the literal build below
    cents = [r for r in cents if r["centroid"] is not None]
    if not cents:
        raise ValueError(
            f"ivf_topk: no usable centroids — every sampled '{emb_col}' "
            "was NULL"
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
    q_norm = sum(b * b for b in query) ** 0.5
    if q_norm == 0.0:
        raise ValueError("ivf_topk: zero-norm query — cosine is undefined")

    def _centroid_sim(centroid) -> float:
        c_norm = sum(a * a for a in centroid) ** 0.5
        if c_norm == 0.0:
            # an all-zeros sampled centroid (padding rows, failed encodes):
            # cosine is undefined, so rank its cell last instead of dying
            # on a driver-side ZeroDivisionError before any Spark job runs
            return -1.0
        return (
            sum(a * b for a, b in zip(centroid, query)) / (c_norm * q_norm)
        )

    q_sims = sorted(
        ((r["__cell"], _centroid_sim(r["centroid"])) for r in cents),
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
