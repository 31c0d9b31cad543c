"""Local replica of the driver's correctness check: run every registry query
on Spark AND its DuckDB oracle, compare row-count + column names + an
order-insensitive value hash (columns sorted by name, rows sorted, values
stringified). Usage: python scripts/check_contract.py [sf_dir]"""

from __future__ import annotations

import hashlib
import os
import sys
import warnings

warnings.filterwarnings("ignore")

# runnable as `python scripts/check_contract.py` from anywhere: Python puts
# the script's own dir (scripts/) on sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df) -> str:
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(
            lambda v: repr(sorted(v)) if isinstance(v, (list, tuple)) else repr(v)
        )
    rows = sorted(tuple(r) for r in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import duckdb

    from hinbox_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("contract_check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    if only:
        queries = {k: v for k, v in queries.items() if k in only}
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {str(ex)[:160]}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(sdf)} (rows-only, no oracle)")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error {type(ex).__name__}: {str(ex)[:160]}")
            failures += 1
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        if not problems:
            hs, hd = value_hash(sdf), value_hash(ddf)
            if hs != hd:
                problems.append(f"value hash {hs} vs {hd}")
        if problems:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if "value hash" in "".join(problems):
                import pandas as pd

                a = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).head(3)
                b = ddf[sorted(ddf.columns)].sort_values(sorted(ddf.columns)).head(3)
                print("  spark:", a.to_dict("records"))
                print("  duck :", b.to_dict("records"))
        else:
            print(f"OK    {name}: {len(sdf)} rows")

    # entry smoke
    if only:
        print(f"{'PASS' if failures == 0 else 'FAIL'}: {len(queries) - failures}/{len(queries)} ok")
        return 1 if failures else 0
    try:
        n = entrymod.entry(spark).count()
        print(f"entry rows: {n}")
    except Exception as ex:
        print(f"FAIL  entry: {type(ex).__name__}: {str(ex)[:200]}")
        failures += 1
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {len(queries) - failures}/{len(queries)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01", sys.argv[2:] or None))
