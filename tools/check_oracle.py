"""Local replica of the driver's correctness gate: run every suite
query on Spark AND its DuckDB oracle at a given sf, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from quasdb_spark import suite  # noqa: E402
from quasdb_spark.session import get_spark  # noqa: E402
from quasdb_spark.sources.tables import TABLES  # noqa: E402


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


# Segmented-compare protocol (VERDICT r14 board #3): queries whose
# result set is linear in the fact table can exceed 10M rows at sf1 —
# materializing BOTH engines' full results through Python drivers is
# what blew the sweep's 600 s budget (the DuckDB oracle itself runs in
# ~1 s; CORRECTNESS_sf1 r14 recorded an oracle_timeout that was really
# a transfer timeout). For these queries the sweep compares the FULL
# row count on both engines, then compares values on a deterministic
# subset predicate (applied identically to both sides). The evidence
# line says so explicitly — same discipline as BENCH_sf100's
# ``protocols`` field: bounded, and labeled as bounded.
_SEGMENT = {"ts_gapfill_interp": "user_id % 50 = 0"}
_SEGMENT_MIN_ROWS = 2_000_000  # below this, full compare as always


def run_checks(spark, sf_dir, only=frozenset(), quiet=False):
    """Compare every suite query against its oracle; returns failures."""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table = a directory of part files (e.g. the
            # tools/gen_sf.py sf1 dataset); driver testdata = one file
            con.sql(f"CREATE VIEW {t} AS FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS FROM '{p}'")

    def say(msg):
        if not quiet:
            print(msg)

    failures = []
    for name, fn in suite.QUERIES.items():
        if only and name not in only:
            continue
        seg = ""
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sql = suite.ORACLES.get(name)
            if sql is not None and name in _SEGMENT:
                scount = sdf.count()
                if scount >= _SEGMENT_MIN_ROWS:
                    ocount = con.sql(
                        f"SELECT count(*) FROM ({sql}) q").fetchall()[0][0]
                    if scount != ocount:
                        failures.append(name)
                        say(f"FAIL  {name}: rowcount {scount} != {ocount}")
                        continue
                    pred = _SEGMENT[name]
                    sdf = sdf.where(pred)
                    sql = f"SELECT * FROM ({sql}) q WHERE {pred}"
                    seg = (f"; full counts match at {scount}, values "
                           f"segmented to '{pred}'")
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            say(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        if sql is None:
            say(f"skip  {name}: no oracle (rows={len(srows)})")
            continue
        try:
            rel = con.sql(sql)
            ocols = list(rel.columns)
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            say(f"FAIL  {name}: DUCKDB ERROR {str(e)[:300]}")
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            failures.append(name)
            say(f"FAIL  {name}: schema {sc} != {oc}")
        elif len(sr) != len(orr):
            failures.append(name)
            say(f"FAIL  {name}: rowcount {len(sr)} != {len(orr)}")
        elif sr != orr:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            say(f"FAIL  {name}: values differ; first diffs: {diffs}")
        else:
            say(f"ok    {name} ({len(sr)} rows{seg})")
    return failures


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[16]",
                      extra_conf={"spark.sql.shuffle.partitions": "16"})
    failures = run_checks(spark, sf_dir, only)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
