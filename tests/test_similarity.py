"""Similarity search: brute-force exact top-k vs numpy oracle; LSH/IVF ANN
recall against the exact result."""

import numpy as np
import pandas as pd
import pytest

from preprocessor_spark.functions.similarity import brute_force_topk, ivf_topk, lsh_topk

RNG = np.random.default_rng(42)
DIM = 16
N = 400


@pytest.fixture(scope="module")
def vectors():
    v = RNG.normal(size=(N, DIM)).astype(np.float32)
    return v


@pytest.fixture(scope="module")
def emb_df(spark, vectors):
    pdf = pd.DataFrame(
        {"vec_id": range(N), "embedding": [row.tolist() for row in vectors]}
    )
    return spark.createDataFrame(pdf).cache()


def _oracle_topk(vectors, q, k):
    sims = vectors @ q / (np.linalg.norm(vectors, axis=1) * np.linalg.norm(q))
    order = np.lexsort((np.arange(N), -sims))
    return list(order[:k]), sims


def test_brute_force_matches_numpy(spark, emb_df, vectors):
    q = vectors[7].astype(np.float64)
    got = brute_force_topk(emb_df, q.tolist(), k=10).collect()
    exp_ids, sims = _oracle_topk(vectors.astype(np.float64), q, 10)
    assert [r["vec_id"] for r in got] == exp_ids
    np.testing.assert_allclose(
        [r["cosine"] for r in got], sims[exp_ids], atol=1e-6
    )
    assert got[0]["vec_id"] == 7 and abs(got[0]["cosine"] - 1.0) < 1e-9


def test_lsh_topk_contains_query_and_subsets_bucket(spark, emb_df, vectors):
    q = vectors[7].astype(np.float64)
    got = lsh_topk(emb_df, q.tolist(), k=10, num_planes=4).collect()
    assert got[0]["vec_id"] == 7  # the query's own vector shares its bucket
    # ANN results are a subset of the corpus with valid cosine ordering
    cosines = [r["cosine"] for r in got]
    assert cosines == sorted(cosines, reverse=True)


def test_ivf_topk_recall(spark, emb_df, vectors):
    q = vectors[3].astype(np.float64)
    exact = [r["vec_id"] for r in brute_force_topk(emb_df, q.tolist(), k=5).collect()]
    approx = [
        r["vec_id"]
        for r in ivf_topk(emb_df, q.tolist(), k=5, num_cells=8, nprobe=8).collect()
    ]
    # nprobe == num_cells probes everything → must equal exact search
    assert approx == exact


def test_inline_paths_bit_identical_to_hof(spark, emb_df):
    """The unrolled codegen variants (dot_inline / norm_inline / the
    dim-given lsh_bucket / py_lsh_bucket) must reproduce the interpreted
    HOF path bit-for-bit: same products, same left-to-right fold."""
    from pyspark.sql import functions as F

    from preprocessor_spark.functions.similarity import (
        _py_fold_dot,
        cosine,
        cosine_inline,
        dot,
        dot_inline,
        lsh_bucket,
        norm,
        norm_inline,
        py_lsh_bucket,
    )

    e = emb_df.withColumn("emb_d", F.col("embedding").cast("array<double>"))
    # dot/norm/cosine of each row against itself (double arrays → the HOF
    # and inline paths do identical double arithmetic)
    cmp = e.select(
        (dot(F.col("emb_d"), F.col("emb_d"))
         == dot_inline(F.col("emb_d"), F.col("emb_d"), DIM)).alias("d_eq"),
        (norm(F.col("emb_d")) == norm_inline("emb_d", DIM)).alias("n_eq"),
        (cosine(F.col("emb_d"), F.col("emb_d"))
         == cosine_inline("emb_d", "emb_d", DIM)).alias("c_eq"),
        (lsh_bucket(F.col("embedding"), 6, 42)
         == lsh_bucket("embedding", 6, 42, dim=DIM)).alias("b_eq"),
    )
    bad = cmp.filter("NOT (d_eq AND n_eq AND c_eq AND b_eq)").count()
    assert bad == 0
    # python twins match the Spark expression results on a sample row
    row = e.select("embedding", lsh_bucket("embedding", 6, 42, dim=DIM).alias("b"),
                   dot(F.col("emb_d"), F.col("emb_d")).alias("dd")).first()
    q = [float(x) for x in row["embedding"]]
    assert py_lsh_bucket(q, 6, 42) == row["b"]
    assert _py_fold_dot(q, q) == row["dd"]


def test_embedding_pairs_plan_barrier(spark):
    """Pins the q_embedding_pairs optimizer barrier (round-4 VERDICT item):
    the 8x win over the naive plan depends on Catalyst NOT pushing the
    cosine filter through the explode(array(...)) Generate node into the
    BroadcastNestedLoopJoin condition, where it would run on the
    interpreted Predicate path as a single task. A Spark upgrade could
    silently change pushdown behavior — this asserts the join condition
    stays the cheap `id_a < id_b` with no dot-product arithmetic."""
    import importlib.util
    import os
    from pathlib import Path

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    entry_path = Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location("spark_entry", entry_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.queries()["embedding_pairs"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    bnlj = [ln for ln in plan.splitlines() if "BroadcastNestedLoopJoin" in ln]
    assert bnlj, f"expected a BroadcastNestedLoopJoin in:\n{plan}"
    for ln in bnlj:
        # the join condition must carry only the id inequality — any
        # reference to the embedding column (element_at/get/emb#n[i] all
        # print the column name) means the dot product leaked into the join
        assert "element_at" not in ln and "embedding" not in ln, (
            f"cosine pushed into join:\n{plan}"
        )
        assert "id_a" in ln and "id_b" in ln, f"unexpected condition:\n{plan}"
    # the barrier itself: the cosine is emitted through a Generate node
    assert "Generate explode" in plan, f"explode barrier missing:\n{plan}"
    # and the threshold filter sits above the join, not inside it
    assert any(
        "Filter" in ln and "cos_sim" in ln for ln in plan.splitlines()
    ), f"cos_sim filter not found above the join:\n{plan}"


def test_similarity_topk_plan_is_single_scan(spark):
    """Pins q_similarity_topk's join-free shape: the query vector is
    collected driver-side and inlined, so the plan must be one scan +
    TakeOrderedAndProject with NO join. The earlier broadcast-crossJoin
    form put the interpreted HOF cosine inside the join's generated
    consume method, blew janino's 64 KB method limit, and silently dropped
    the whole stage to interpreted execution — a regression a future edit
    could quietly reintroduce."""
    import importlib.util
    import os
    from pathlib import Path

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    entry_path = Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location("spark_entry", entry_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.queries()["similarity_topk"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan


def test_lsh_bucket_arrow_bit_identical_to_inline(spark, emb_df):
    """The vectorized Arrow signature twin must reproduce the inline
    codegen signature EXACTLY (same md5 weights, same dim fold order, same
    strict sign rule) — it is what embedding_bucket_keys/lsh_topk switch
    to past LSH_INLINE_TERM_LIMIT, where Spark can no longer compile the
    unrolled expressions."""
    from preprocessor_spark.functions.similarity import (
        lsh_bucket,
        lsh_bucket_arrow,
    )

    for planes, seed in ((8, 42), (12, 7), (1, 99)):
        out = emb_df.select(
            lsh_bucket("embedding", planes, seed, dim=DIM).alias("a"),
            lsh_bucket_arrow("embedding", planes, seed, dim=DIM).alias("b"),
        )
        assert out.filter("a <> b").count() == 0
    # NULL and wrong-length embeddings produce signature 0 on both paths
    odd = spark.createDataFrame(
        pd.DataFrame({"embedding": [None, [1.0] * (DIM - 1), [1.0] * DIM]}),
        schema=f"embedding array<float>",
    )
    rows = odd.select(
        lsh_bucket("embedding", 4, 42, dim=DIM).alias("a"),
        lsh_bucket_arrow("embedding", 4, 42, dim=DIM).alias("b"),
    ).collect()
    assert [r["a"] for r in rows] == [r["b"] for r in rows]
    assert rows[0]["b"] == 0 and rows[1]["b"] == 0


def test_embedding_bucket_keys_backend_dispatch(spark, emb_df):
    """Past LSH_INLINE_TERM_LIMIT the bucket keys come from the Arrow stage
    (ArrowEvalPython in the plan); below it, pure inline expressions (no
    Python anywhere). Both produce identical (ti, bv) keys."""
    from preprocessor_spark.functions.dedup import embedding_bucket_keys
    from preprocessor_spark.functions.similarity import LSH_INLINE_TERM_LIMIT

    planes_big = LSH_INLINE_TERM_LIMIT // DIM + 1  # dim*planes just over
    big = embedding_bucket_keys(
        emb_df, "embedding", "vec_id", planes_big, 42, dim=DIM, num_tables=2
    )
    assert "ArrowEvalPython" in big._jdf.queryExecution().executedPlan().toString()
    small = embedding_bucket_keys(
        emb_df, "embedding", "vec_id", 2, 42, dim=DIM, num_tables=2
    )
    assert (
        "ArrowEvalPython"
        not in small._jdf.queryExecution().executedPlan().toString()
    )
    # cross-check the big path against the inline per-plane construction
    # at the same planes count (forced by calling lsh_bucket directly)
    from preprocessor_spark.functions.similarity import lsh_bucket
    import pyspark.sql.functions as F

    inline = emb_df.select(
        F.col("vec_id"),
        *[
            lsh_bucket(
                "embedding", planes_big, 42 + 1_000_003 * t, dim=DIM
            ).alias(f"bv{t}")
            for t in range(2)
        ],
    )
    joined = (
        big.groupBy("vec_id")
        .pivot("ti", [0, 1])
        .sum("bv")
        .join(inline, "vec_id")
    )
    assert (
        joined.filter("`0` <> bv0 OR `1` <> bv1").count() == 0
        and joined.count() == N
    )


def test_large_dim_scoring_avoids_inline_codegen(spark):
    """Past LSH_INLINE_TERM_LIMIT both pair verification and query scoring
    must take the HOF path (no dim-term unrolled dot in the plan), and
    still return correct neighbors: identical vectors score cosine 1."""
    import numpy as np
    import pyspark.sql.functions as F

    from preprocessor_spark.functions.dedup import embedding_near_dups
    from preprocessor_spark.functions.similarity import (
        LSH_INLINE_TERM_LIMIT,
        lsh_topk,
    )

    dim = LSH_INLINE_TERM_LIMIT + 64
    rng = np.random.default_rng(7)
    base = rng.normal(0, 1, dim)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base]),  # exact duplicate of 0
        (2, [float(x) for x in rng.normal(0, 1, dim)]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")

    pairs = embedding_near_dups(
        df, "embedding", "vec_id", num_planes=4, threshold=0.99, dim=dim
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]

    topk = lsh_topk(
        df, [float(x) for x in base], k=2, num_planes=4
    ).collect()
    assert topk[0]["vec_id"] in (0, 1)
    assert abs(topk[0]["cosine"] - 1.0) < 1e-6


def test_ivf_topk_skips_null_embedding_centroids(spark, emb_df, vectors):
    """A cell whose min_by row has a NULL embedding must be skipped (its
    members re-assign to the nearest real centroid), not crash the driver
    building the centroid literal."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    null_row = spark.createDataFrame(
        [(0, None)],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    # vec_id=0 is the minimum of its hash cell → min_by picks the null
    df = emb_df.filter(F.col("vec_id") != 0).unionByName(null_row)
    q = vectors[1].tolist()
    got = ivf_topk(df, q, k=5, num_cells=4, nprobe=4).collect()
    assert len(got) == 5 and all(r["vec_id"] != 0 for r in got)


def test_topk_dim_mismatch_fails_fast(spark, emb_df):
    """A query whose length disagrees with the corpus dim used to return
    silently-truncated cosines (short query) or an empty/garbage top-k
    (long query NULL-poisons the signature). All three top-k entry points
    now fail fast via validate_dim."""
    import pytest as pt

    from preprocessor_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )

    short_q = [1.0] * (len(emb_df.first()["embedding"]) - 2)
    for fn in (brute_force_topk, lsh_topk, ivf_topk):
        with pt.raises(ValueError, match="dim"):
            fn(emb_df, short_q, k=3)


def test_ivf_topk_zero_norm_vectors(spark, emb_df):
    """An all-zeros sampled centroid must rank its cell last, not kill the
    driver with ZeroDivisionError; an all-zeros QUERY is refused (cosine
    undefined)."""
    import pytest as pt
    from pyspark.sql import functions as F

    from preprocessor_spark.functions.similarity import ivf_topk

    dim = len(emb_df.first()["embedding"])
    zeroed = emb_df.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 7 == 0,
            F.array(*[F.lit(0.0) for _ in range(dim)]),
        ).otherwise(F.col("embedding").cast("array<double>")),
    )
    q = emb_df.first()["embedding"]
    out = ivf_topk(zeroed, [float(x) for x in q], k=5).collect()
    assert len(out) == 5  # no crash, real neighbors returned
    with pt.raises(ValueError, match="zero-norm query"):
        ivf_topk(emb_df, [0.0] * dim, k=3)


def test_inline_sql_operand_handles_reserved_word_columns(spark):
    """Plain-identifier operands are backtick-quoted in the generated SQL,
    so a column named like a reserved word ('order') takes the inline fast
    path instead of a parse error."""
    from pyspark.sql import functions as F

    from preprocessor_spark.functions.similarity import dot_inline

    df = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0])], ["order", "values"]
    )
    got = df.select(
        dot_inline("order", "values", 2).alias("d")
    ).collect()[0]["d"]
    assert got == 11.0
