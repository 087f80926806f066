#!/usr/bin/env python3
"""DuckDB value-oracle for the KlineScale evidence run.

`SPARK_GRAFT_KLINE_KEEP=<dir> sbt 'runMain graft.KlineScale'` lands the
two generated monthly CSVs under <dir>/landing and dumps the warehouse
bars under <dir>/bars_out. This tool replays the SAME CSV bytes through
DuckDB's spelling of the flagship hourly aggregate (the registered
ohlc_hourly oracle) and compares every bar VALUE:

- bucket, event_type, open, high, low, close, n_trades: EXACT (arg_min /
  arg_max pick stored doubles; no arithmetic to drift) — compared via
  one md5 over the sorted, canonically-formatted rows, the driver gate's
  hash idiom.
- volume (sum of 3600 doubles per bar): engine summation ORDER differs,
  so compared to 1e-9 relative tolerance.

Usage: python3 tools/kline_oracle.py <dir>
Prints one KLINE_ORACLE {json} line; exit 1 on any mismatch.
"""
import glob
import hashlib
import json
import sys

import duckdb

base = sys.argv[1]
con = duckdb.connect()

csvs = sorted(glob.glob(f"{base}/landing/*/part*.csv"))
assert csvs, f"no landed CSV under {base}/landing"
cols = ("open_time BIGINT, open DOUBLE, high DOUBLE, low DOUBLE, "
        "close DOUBLE, volume DOUBLE, close_time BIGINT, quote_volume DOUBLE, "
        "n_trades BIGINT, taker_base DOUBLE, taker_quote DOUBLE, ignore_col VARCHAR")
con.execute(f"""
  CREATE VIEW events AS
  SELECT make_timestamp(open_time * 1000) AS ts, close AS value,
         'BTCUSDT-1s' AS event_type
  FROM read_csv({json.dumps(csvs)}, header=false,
                columns={{{', '.join("'%s': '%s'" % tuple(c.strip().split(' ')) for c in cols.split(','))}}})
""")
oracle = con.execute("""
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, event_type,
    arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
    arg_max(value, ts) AS close, sum(value) AS volume, count(*) AS n_trades
  FROM events GROUP BY 1, 2 ORDER BY bucket
""").fetchall()
spark_bars = con.execute(f"""
  SELECT bucket, event_type, open, high, low, close, volume, n_trades
  FROM '{base}/bars_out/*.parquet' ORDER BY bucket
""").fetchall()

def exact_key(rows):
    h = hashlib.md5()
    for r in rows:
        h.update(("|".join([str(r[0]), r[1]] +
                           ["%.17g" % v for v in r[2:6]] +
                           [str(r[7])]) + "\n").encode())
    return h.hexdigest()

n = len(spark_bars)
ok_rows = n == len(oracle)
h_spark, h_duck = exact_key(spark_bars), exact_key(oracle)
ok_exact = ok_rows and h_spark == h_duck
vol_ok = ok_rows and all(
    abs(a[6] - b[6]) <= 1e-9 * max(abs(a[6]), abs(b[6]), 1.0)
    for a, b in zip(spark_bars, oracle))
verdict = "hash_match" if (ok_exact and vol_ok) else "MISMATCH"
print(json.dumps({
    "tool": "KLINE_ORACLE", "oracle": verdict, "bars": n,
    "exact_cols_md5": h_spark, "exact_cols_match": ok_exact,
    "volume_rel_tol": 1e-9, "volume_match": vol_ok}))
sys.exit(0 if verdict == "hash_match" else 1)
