"""Local simulation of the driver's correctness gate: run each queries()
entry and its oracle_sql() twin at a given SF, compare row-count, schema
(column names), and an order-insensitive value hash (columns sorted by name,
values canonicalized, row-hash set compared).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def canon(df: pd.DataFrame) -> tuple[list[str], set[str], int]:
    cols = sorted(df.columns)
    df = df[cols]
    hashes = set()
    for row in df.itertuples(index=False):
        parts = []
        for v in row:
            if isinstance(v, float):
                parts.append(f"{v:.6g}")
            elif hasattr(v, "isoformat"):
                parts.append(pd.Timestamp(v).isoformat())
            else:
                parts.append(str(v))
        hashes.add(hashlib.md5("|".join(parts).encode()).hexdigest())
    return cols, hashes, len(df)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from preprocessor_spark import get_spark

    spark = get_spark("oracle_check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only check)")
            if len(sdf) == 0 and name != "simhash_neardups":
                print(f"  WARN {name}: zero rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            continue
        sc, sh, sn = canon(sdf)
        oc, oh, on = canon(odf)
        ok = True
        if sn != on:
            print(f"FAIL  {name}: rows spark={sn} duck={on}")
            ok = False
        if sc != oc:
            print(f"FAIL  {name}: cols spark={sc} duck={oc}")
            ok = False
        if ok and sh != oh:
            miss = len(oh - sh)
            extra = len(sh - oh)
            print(f"FAIL  {name}: value hash mismatch (missing={miss} extra={extra})")
            # show a sample diff to debug
            sk = sdf[sorted(sdf.columns)].astype(str)
            ok_ = odf[sorted(odf.columns)].astype(str)
            merged = sk.merge(ok_, how="outer", indicator=True)
            print(merged[merged["_merge"] != "both"].head(6).to_string())
            ok = False
        if ok:
            print(f"OK    {name}: {sn} rows")
        else:
            failures.append(name)
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
