"""Local replica of the driver's correctness gate — dtype-strict.

Round-1 lesson (VERDICT.md "What's wrong"): the driver hashes *typed*
values through the pandas fetch path, so a Spark ``decimal(38,6)``
(Python ``Decimal`` object) never matches a DuckDB decimal that pandas
fetches as ``float64`` — even when every value is equal.  The old
checker stringified cells with a 1e-9 float tolerance and reported
52/52 where the driver reported 31/50.

This version compares the way the driver does, calibrated against the
round-1 evidence:

- floats must match **bit-for-bit** (struct-packed IEEE bits);
- a ``Decimal`` object vs a float is a FAIL (the q01..q50 class);
- an int vs a float is a FAIL (the q14/q20/q42 class: DuckDB
  ``SUM(int)`` fetches as float64);
- integer *widths* are tolerated (int32 vs int64): q26/q27 passed the
  driver hash with Spark ``row_number()`` int32 against DuckDB BIGINT;
- temporals are normalized to ``pandas.Timestamp`` (q11/q12 passed
  with Spark/DuckDB timestamp representations differing in unit).

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from etl_wrap_spark import catalog
from etl_wrap_spark.session import TABLES, get_session


def canon_cell(v):
    """Canonical typed form: (kind, payload). Distinct kinds never compare
    equal, which is what makes Decimal-vs-float and int-vs-float strict."""
    if v is None:
        return ("null",)
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return ("null",)
        return ("f", struct.pack("<d", f))
    if isinstance(v, (bool, np.bool_)):
        return ("i", int(v))  # DuckDB booleans fetch as bool; Spark as int-ish
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return ("null",)
        return ("t", v.to_pydatetime().replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("t", _dt.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v))
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("l", tuple(canon_cell(x) for x in v))
    try:
        if pd.isna(v):
            return ("null",)
    except (TypeError, ValueError):
        pass
    return ("o", repr(v))


def frame_rows(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [tuple(canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=repr)
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_session("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only check, {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        scols, srows = frame_rows(sdf)
        ocols, orows = frame_rows(odf)
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            failures.append(name)
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: first diff at sorted-row {bad[0]}:\n  spark : {bad[1]}\n  oracle: {bad[2]}")
            failures.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
