#!/usr/bin/env python3
"""Local pre-check mimicking the driver's t2 gate: run graft.Verify output
against DuckDB executing SparkEntry.oracleSql on the same parquet fixtures.

Usage: python3 tools/check.py <sfdir> <verify_outdir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # lists/arrays aren't sortable -> stringify for ordering only
    key = df.map(lambda v: str(v))
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def cmp_cell(a, b) -> bool:
    import math
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if a is None and b is None:
        return True
    try:
        import numpy as np
        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            return list(a) == list(b)
    except Exception:
        pass
    # dtype normalization (VERDICT r07 nit): DuckDB CAST AS DATE reaches
    # pandas as datetime64/Timestamp, Spark as datetime.date — same value,
    # different str(). Compare date-like cells on the ISO date alone so
    # this gate agrees with the driver's comparator (the x120 artifact).
    import datetime
    def _datestr(v):
        try:
            if isinstance(v, datetime.datetime):
                if v.time() == datetime.time(0, 0):
                    return v.date().isoformat()
                return v.isoformat()
            if isinstance(v, datetime.date):
                return v.isoformat()
        except (ValueError, TypeError):  # pandas NaT subclasses datetime
            return None
        return None
    da, db = _datestr(a), _datestr(b)
    if da is not None and db is not None:
        return da == db
    if str(a) == str(b):
        return True
    try:
        return float(a) == float(b)
    except Exception:
        return False


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pq = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not pq:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            got = canon(pd.concat([pd.read_parquet(p) for p in pq]))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}");  n_fail += 1;  continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1;  continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1;  continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not cmp_cell(got[c].iloc[i], want[c].iloc[i]):
                    bad = (i, c, got[c].iloc[i], want[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # rows-only queries
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle or (only and name not in only):
            continue
        pq = sorted(glob.glob(f"{d}/*.parquet"))
        n = sum(len(pd.read_parquet(p)) for p in pq) if pq else 0
        status = "ROWS-ONLY ok" if n > 0 else "ROWS-ONLY EMPTY (!)"
        print(f"{status} {name} ({n} rows)")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
