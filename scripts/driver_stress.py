"""Full driver simulation: BARE SparkSession (no repo configs, Arrow off by
default), all 50 queries() entries at sf0.01 vs oracle_sql() in DuckDB,
canon = sorted columns, sorted rows, int64-normalized, exact values."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as E
from geojson_utility_spark.entry_queries import TABLES

_mem = os.environ.get("DRIVER_STRESS_MEM")  # absent = JVM default (~1g)
_b = SparkSession.builder.master("local[32]").appName("driver_dryrun")
if _mem:
    _b = _b.config("spark.driver.memory", _mem)
spark = _b.getOrCreate()
# DRIVER_STRESS_SF: run the sweep at another scale (e.g. sf0.1 to prove the
# data-coupled oracles off sf0.01).  The data-coupled oracle builders read
# SPARK_GRAFT_ORACLE_SF — keep it in lockstep or their guards fire (by design).
sf = os.environ.get("DRIVER_STRESS_SF", "/root/testdata/sf0.01")
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", sf)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


queries = E.queries()
oracles = E.oracle_sql()
results = {}
t_all = time.time()
for name in list(queries)[:50]:
    t0 = time.time()
    try:
        got = canon(queries[name](spark, sf).toPandas())
        want = canon(con.execute(oracles[name]).fetchdf())
        ok = len(got) == len(want) and got.equals(want)
        results[name] = {"ok": bool(ok), "rows": len(got), "oracle_rows": len(want),
                         "sec": round(time.time() - t0, 1)}
    except Exception as e:
        results[name] = {"ok": False, "err": str(e)[:300],
                         "sec": round(time.time() - t0, 1)}
    print(name, results[name], flush=True)

n_ok = sum(1 for r in results.values() if r.get("ok"))
print(json.dumps({"green": n_ok, "total": len(results),
                  "wall": round(time.time() - t_all, 1)}), flush=True)
bad = {k: v for k, v in results.items() if not v.get("ok")}
if bad:
    print("FAILURES:", json.dumps(bad), flush=True)
spark.stop()
# NOTE: this is the round-5 stress harness that found the accumulated-session
# heap exhaustion (BENCH.md round-5 addendum 3).  It is intentionally HARSHER
# than the real driver: bare SparkSession (default 1g driver heap, no repo
# configs, Arrow off).  Expect 49-50/50 green; residual failures at 1g are
# GC variance of 32 threads in a ~300 MB execution pool.
