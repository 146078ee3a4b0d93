"""Six-way dataset splitter — exact-count positional split with the
reference's remainder rule, expressed as a ``split_id`` LABEL COLUMN on one
distributed DataFrame (never six driver-side objects; SURVEY §1.5).

Reference semantics (app/core/data_processor.py):
  * temporal sort before split (``:242-243``);
  * per-split counts: ``int(n·ratio)`` then the remainder distributed one
    sample at a time to the LARGEST ratios (stable d1..d6 order on ties)
    (``:313-350``, remainder rule ``:338-345``);
  * contiguous positional slices in order d1..d6 (``:262-272``);
  * default ratios d1=0.5, d2..d6=0.1 (``:108-109``);
  * shuffled (non-temporal) variant: seeded permutation (``:248-253``);
  * per-split temporal boundary metadata (``:352-389``).

Spark mapping (SURVEY §2.5 W6/W7/W8): two passes —
  1. ``count()`` on the driver → compute exact boundaries with the
     reference's remainder arithmetic (driver-side, O(1));
  2. global ``row_number() OVER (ORDER BY t)`` → bucket by boundary.
A naive ntile(6) does NOT reproduce the counts. The global row_number is a
single range-partitioned sort (Spark samples boundaries, so it is NOT a
one-task bottleneck); at 10^12 scale positional splits are replaced by the
time-boundary splits this module also emits (``boundaries`` →
``split_by_time_boundaries`` = pure partition-pruning predicates).
"""

from __future__ import annotations

import bisect

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from preprocessor_spark.params import StageParams

SPLIT_KEYS = ["d1", "d2", "d3", "d4", "d5", "d6"]
DEFAULT_RATIOS = {"d1": 0.5, "d2": 0.1, "d3": 0.1, "d4": 0.1, "d5": 0.1, "d6": 0.1}


def split_counts(total: int, ratios: dict[str, float]) -> dict[str, int]:
    """Exact per-split counts — bit-identical to the reference's
    _calculate_split_indices (app/core/data_processor.py:313-350):
    floor allocation, remainder round-robin over ratio-descending keys
    (Python stable sort ⇒ d1..d6 insertion order breaks ties)."""
    missing = [k for k in SPLIT_KEYS if k not in ratios]
    if missing:
        raise ValueError(
            f"ratios must provide all six split keys; missing {missing}"
        )
    negative = {k: ratios[k] for k in SPLIT_KEYS if ratios[k] < 0}
    if negative:
        # the constructor's sum-to-1 tolerance alone admits these (e.g.
        # three_way(0.5, 0.6) → d3 = -0.1, sum exactly 1.0) and a negative
        # count would silently shortchange the splits before it
        raise ValueError(f"split ratios must be non-negative, got {negative}")
    counts = {k: int(total * ratios[k]) for k in SPLIT_KEYS}
    remainder = total - sum(counts.values())
    # sort over SPLIT_KEYS (not ratios.keys()): the stable sort then
    # breaks ratio ties in canonical d1..d6 order regardless of the
    # caller's dict insertion order — the rule the oracles hardcode
    sorted_keys = sorted(SPLIT_KEYS, key=lambda k: ratios[k], reverse=True)
    i = 0
    while remainder > 0:
        counts[sorted_keys[i % len(sorted_keys)]] += 1
        remainder -= 1
        i += 1
    while remainder < 0:
        # ratio sums in (1.0, 1.001] — inside the constructor's documented
        # tolerance — can over-allocate the floors; take the excess back
        # round-robin from the largest ratios (never below zero)
        k = sorted_keys[i % len(sorted_keys)]
        if counts[k] > 0:
            counts[k] -= 1
            remainder += 1
        i += 1
    if sum(counts.values()) != total:  # explicit: survives python -O
        raise RuntimeError(
            f"split allocation failed: {counts} does not sum to {total}"
        )
    return counts


def split_boundaries(total: int, ratios: dict[str, float]) -> list[tuple[str, int, int]]:
    """Contiguous [start, end) row-position slices in d1..d6 order."""
    counts = split_counts(total, ratios)
    out, cur = [], 0
    for k in SPLIT_KEYS:
        out.append((k, cur, cur + counts[k]))
        cur += counts[k]
    return out


class TemporalSplitter:
    name = "splitter"

    def __init__(
        self,
        ratios: dict[str, float] | None = None,
        time_col: str = "ts",
        tiebreak_cols: list[str] | None = None,
        shuffle: bool = False,
        seed: int | None = 42,
    ):
        self.ratios = dict(ratios or DEFAULT_RATIOS)
        s = sum(self.ratios.values())
        if abs(s - 1.0) > 0.001:  # reference tolerance data_processor.py:44
            raise ValueError(f"split ratios must sum to 1.0, got {s}")
        self.time_col = time_col
        self.tiebreak_cols = tiebreak_cols or []
        self.shuffle = shuffle
        self.seed = seed

    def transform(self, df: DataFrame) -> DataFrame:
        """Label every row with split_id ∈ d1..d6 (exact reference counts).

        Global positions come from
        :func:`preprocessor_spark.operators.positions.grouped_positions` —
        range-partitioned sort + per-partition offsets — NOT a
        single-partition ``row_number() OVER (ORDER BY …)`` window, so the
        labeling stage scales with the cluster instead of serializing on
        one task (SURVEY §7 risk 2)."""
        from preprocessor_spark.operators.positions import (
            grouped_positions_and_totals,
        )

        if self.shuffle:
            # W8: seeded permutation via hash ordering (not F.rand) so the
            # assignment is stable across partition counts (SURVEY §7 risk 5)
            hashed = df.withColumn(
                "__ord", F.xxhash64(F.lit(self.seed or 0), F.struct(*df.columns))
            )
            positioned, totals = grouped_positions_and_totals(
                hashed, ["__ord", *df.columns]
            )
            positioned = positioned.drop("__ord")
        else:
            positioned, totals = grouped_positions_and_totals(
                df, [self.time_col, *self.tiebreak_cols]
            )
        # exact total falls out of the positions machinery's bucket-count
        # aggregate — no second pass over the windowed plan
        total = totals.get((), 0)
        bounds = split_boundaries(total, self.ratios)
        pos = F.col("__pos")
        expr = F.lit(None).cast("string")
        for k, start, end in reversed(bounds):
            expr = F.when((pos >= start) & (pos < end), F.lit(k)).otherwise(expr)
        return positioned.withColumn("split_id", expr).drop("__pos")

    def fit_time_boundaries(
        self, df: DataFrame, n_buckets: int = 4096
    ) -> StageParams:
        """Exact per-split time boundaries WITHOUT positioning every row.

        The positional path (transform → boundaries) shuffles the whole
        table through a row_number window just to read 12 timestamps back.
        This fit instead treats the problem as an exact quantile lookup:

          1. min/max of the time key (one columnar pass);
          2. value-range bucket counts (one pass, tiny collect) → the
             global position offsets of every bucket + the exact total →
             the reference's remainder rule gives the split edge positions;
          3. the row AT each edge position lives in a known bucket at a
             known within-bucket rank — ONE more pass sorts only the few
             edge buckets (≤ 2 per split, ~total/n_buckets rows each) and
             reads the edge timestamps.

        Three passes over the time column, no full-width shuffle — the
        10^12-scale fit path. Labels then come from
        :meth:`split_by_time_boundaries` (pure predicates). Equivalent to
        the positional path whenever edge timestamps are unique (the same
        precondition split_by_time_boundaries already carries)."""
        from preprocessor_spark.operators.positions import _encode_lead

        enc = _encode_lead(df, self.time_col)
        lo, hi = df.agg(F.min(enc), F.max(enc)).collect()[0]
        if lo is None:
            # all-null encodings: only legitimate for an EMPTY table — a
            # non-castable time column (e.g. string timestamps) would
            # otherwise silently fit empty boundaries and label every row
            # split_id=NULL downstream
            if not df.isEmpty():
                dtype = dict(df.dtypes)[self.time_col]
                raise ValueError(
                    f"fit_time_boundaries: time column '{self.time_col}' "
                    f"(dtype {dtype}) encodes to NULL for every row — cast "
                    "it to a timestamp/numeric type before fitting"
                )
            return StageParams(
                stage=self.name, method="temporal",
                params={"ratios": self.ratios, "boundaries": {}},
            )
        span = max(float(hi) - float(lo), 1.0)
        # null keys are detectable here for free (F.least would silently
        # bucket them LAST while the within-bucket window ranks them FIRST
        # — corrupted edge positions) but they cannot be expressed in the
        # time-range predicates this fit exists to produce: fail fast
        bucket = F.when(enc.isNull(), F.lit(-1)).otherwise(
            F.least(
                F.floor((enc - F.lit(float(lo))) / F.lit(span / n_buckets)),
                F.lit(n_buckets - 1),
            )
        ).cast("int")
        counts = (
            df.groupBy(bucket.alias("__bkt")).count().orderBy("__bkt").collect()
        )
        if counts and counts[0]["__bkt"] == -1:
            raise ValueError(
                f"time column '{self.time_col}' contains "
                f"{counts[0]['count']} null values: time-boundary splits "
                "are range predicates and cannot route null timestamps — "
                "drop/fill them first, or use the positional transform() "
                "path (which places nulls in the first split)"
            )
        off, acc = {}, 0
        for r in counts:
            off[r["__bkt"]] = acc
            acc += r["count"]
        total = acc
        bounds = split_boundaries(total, self.ratios)
        edges = sorted(
            {p for _, s, e in bounds if e > s for p in (s, e - 1)}
        )
        # map each edge position to (bucket, within-bucket rank)
        bkts = sorted(off)
        wanted: dict[int, list[int]] = {}
        for p in edges:
            # rightmost bucket with offset <= p
            i = bisect.bisect_right([off[b] for b in bkts], p) - 1
            b = bkts[i]
            wanted.setdefault(b, []).append(p - off[b])
        pair_pred = None
        for b, ranks in wanted.items():
            c = (F.col("__bkt") == b) & F.col("__rn").isin(ranks)
            pair_pred = c if pair_pred is None else (pair_pred | c)
        w = Window.partitionBy("__bkt").orderBy(self.time_col, *self.tiebreak_cols)
        hit = (
            df.select(self.time_col, *self.tiebreak_cols, bucket.alias("__bkt"))
            .filter(F.col("__bkt").isin(list(wanted)))
            .withColumn("__rn", F.row_number().over(w) - 1)
            .filter(pair_pred)
            .select("__bkt", "__rn", self.time_col)
            .collect()
        )
        ts_at = {
            off[r["__bkt"]] + r["__rn"]: r[self.time_col] for r in hit
        }
        rows = {}
        for k, s, e in bounds:
            if e <= s:
                continue
            rows[k] = {
                "split_id": k,
                "start_time": str(ts_at[s]),
                "end_time": str(ts_at[e - 1]),
                "sample_count": e - s,
            }
        # Tie detection: when the timestamp AT a split edge continues across
        # the boundary (tie-heavy time columns — e.g. many rows per minute),
        # the inclusive [start, end] predicates of split_by_time_boundaries
        # give every tied row to the EARLIER split, so positional counts
        # above would diverge from what the labels produce. Detect it from
        # the edge timestamps already in hand (zero extra work) and, when
        # present, record the ACTUAL predicate-derived counts and bounds
        # (one extra aggregate over the time column only) so the persisted
        # params always agree with the labels they will generate.
        order = [k for k in SPLIT_KEYS if k in rows]
        tied = any(
            rows[a]["end_time"] == rows[b]["start_time"]
            for a, b in zip(order, order[1:])
        )
        if tied:
            labeled = TemporalSplitter.split_by_time_boundaries(
                df.select(self.time_col), self.time_col, rows
            )
            actual = {
                r["split_id"]: r
                for r in labeled.groupBy("split_id")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.min(self.time_col).alias("t0"),
                    F.max(self.time_col).alias("t1"),
                )
                .collect()
            }
            for k in list(rows):
                a = actual.get(k)
                if a is None:  # fully absorbed by a tie run — drop the split
                    del rows[k]
                    continue
                rows[k] = {
                    "split_id": k,
                    "start_time": str(a["t0"]),
                    "end_time": str(a["t1"]),
                    "sample_count": a["n"],
                }
        return StageParams(
            stage=self.name,
            method="temporal",
            params={
                "ratios": self.ratios,
                "boundaries": rows,
                "boundary_ties": tied,
            },
        )

    def stratified(self, df: DataFrame, strat_col: str) -> DataFrame:
        """W9 stratified split — the reference VALIDATES a ``stratify_column``
        config (feasibility: ≤10% unique values,
        app/core/data_processor.py:29,188-198) but ships no execution path;
        this is the execution the validation implies: per-stratum exact
        proportional allocation with the same remainder rule as W6.

        Mechanics: rows are ordered within each stratum by a seeded stable
        hash (deterministic at any parallelism — the W8 principle), given
        dense per-stratum positions, and bucketed by per-stratum boundaries
        computed on the driver from the exact stratum totals (which fall
        out of the positions machinery's count aggregate). Boundaries ship
        back as a broadcast range table — no global sort, no skew on a hot
        stratum (positions machinery buckets within each stratum)."""
        from preprocessor_spark.operators.positions import (
            grouped_positions_and_totals,
        )

        # one pass for the feasibility guard (was distinct().count() PLUS
        # count() — two full scans); runs before the positions machinery so
        # a non-categorical column fails here, not as a driver-side OOM on
        # the |strata|x|buckets| counts collect
        n_unique, total = df.agg(
            F.count_distinct(F.col(strat_col)), F.count(F.lit(1))
        ).collect()[0]
        if total and n_unique > max(total * 0.1, 1):
            raise ValueError(
                f"stratify column {strat_col!r} has {n_unique} unique values "
                f"(> 10% of {total} rows) — not a categorical stratum "
                "(reference feasibility rule, app/core/data_processor.py:188-198)"
            )
        hashed = df.withColumn(
            "__ord", F.xxhash64(F.lit(self.seed or 0), F.struct(*df.columns))
        )
        # full-row tiebreaks after the hash, same as transform()'s shuffle
        # path: a 64-bit hash collision between two distinct rows in one
        # stratum would otherwise leave their relative order (and so their
        # split) partition-order-dependent
        positioned, totals = grouped_positions_and_totals(
            hashed, ["__ord", *df.columns], group_cols=[strat_col]
        )
        rows = []
        for key, n in totals.items():
            g = key[0] if key else None
            for k, s, e in split_boundaries(n, self.ratios):
                if e > s:
                    rows.append((g, k, s, e))
        spark = df.sparkSession
        strat_field = df.schema[strat_col]
        from pyspark.sql import types as T

        bschema = T.StructType(
            [
                strat_field,
                T.StructField("split_id", T.StringType()),
                T.StructField("__s", T.LongType()),
                T.StructField("__e", T.LongType()),
            ]
        )
        bdf = spark.createDataFrame(rows, bschema)
        joined = positioned.join(
            F.broadcast(bdf),
            on=[
                # null-safe: a null stratum is a legitimate group — plain
                # equality would silently drop those rows from the output
                positioned[strat_col].eqNullSafe(bdf[strat_col]),
                positioned["__pos"] >= bdf["__s"],
                positioned["__pos"] < bdf["__e"],
            ],
        )
        return joined.drop(bdf[strat_col]).drop("__pos", "__ord", "__s", "__e")

    def boundaries(self, labeled: DataFrame) -> DataFrame:
        """W7 temporal-boundaries metadata: per split start/end time + count
        (reference app/core/data_processor.py:352-389). These time bounds are
        the scale-path split predicates (partition pruning)."""
        return labeled.groupBy("split_id").agg(
            F.min(self.time_col).alias("start_time"),
            F.max(self.time_col).alias("end_time"),
            F.count(F.lit(1)).alias("sample_count"),
        )

    def params(self, labeled: DataFrame) -> StageParams:
        rows = {r["split_id"]: r.asDict() for r in self.boundaries(labeled).collect()}
        for v in rows.values():
            for c in ("start_time", "end_time"):
                v[c] = str(v[c])
        return StageParams(
            stage=self.name,
            method="temporal" if not self.shuffle else "shuffle",
            params={"ratios": self.ratios, "boundaries": rows},
        )

    @classmethod
    def three_way(
        cls,
        d1_proportion: float = 0.2,
        d2_proportion: float = 0.6,
        time_col: str = "ts",
        tiebreak_cols: list[str] | None = None,
    ) -> "TemporalSplitter":
        """W10 default-plugin three-way split (reference
        app/plugins/plugin_default.py:120-127): positional slices at
        d1/d2 proportions; remaining mass goes to d3, the other three
        splits get ratio 0 (and therefore 0 rows — same machinery)."""
        d3 = 1.0 - d1_proportion - d2_proportion
        return cls(
            ratios={
                "d1": d1_proportion,
                "d2": d2_proportion,
                "d3": d3,
                "d4": 0.0,
                "d5": 0.0,
                "d6": 0.0,
            },
            time_col=time_col,
            tiebreak_cols=tiebreak_cols,
        )

    @staticmethod
    def split_by_time_boundaries(
        df: DataFrame, time_col: str, boundaries: dict[str, dict]
    ) -> DataFrame:
        """Scale path: assign split_id from persisted time boundaries — a pure
        predicate (partition-prunable), no global sort, no row_number."""
        # boundaries are persisted as strings; cast them to the time
        # column's ACTUAL type — a hard cast("timestamp") turns an epoch
        # int/double key like '1700000000' into null, which nulls every
        # predicate and silently leaves all rows unlabeled
        dt = df.schema[time_col].dataType.simpleString()
        expr = F.lit(None).cast("string")
        for k in reversed(SPLIT_KEYS):
            if k not in boundaries:
                continue
            b = boundaries[k]
            expr = F.when(
                (F.col(time_col) >= F.lit(b["start_time"]).cast(dt))
                & (F.col(time_col) <= F.lit(b["end_time"]).cast(dt)),
                F.lit(k),
            ).otherwise(expr)
        return df.withColumn("split_id", expr)
