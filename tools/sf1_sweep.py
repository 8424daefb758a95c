"""Full-suite sf1 correctness sweep with a per-query oracle budget.

Runs every suite query at the sf1 dataset against its DuckDB oracle
(one subprocess per query via tools/check_oracle.py so a single
heavyweight oracle cannot stall the sweep), merges any prior results,
and writes CORRECTNESS_sf1.json:

  {"sf_dir", "git_head", "when", "ok": [...], "fail": {name: detail},
   "oracle_timeout": {name: spark_rows}, "timeout_sec", "counts"}

A query whose ORACLE blows the budget is recorded under
``oracle_timeout`` with the Spark side's row count (computed within
the same budget) — the weaker rows-only evidence, explicitly labeled,
never silently dropped. Skip already-decided queries by passing a
prior log/JSON via --merge.

Usage: python tools/sf1_sweep.py [sf_dir] [--timeout SEC]
       [--merge FILE ...] [--only name ...]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def prior_results(paths: list[str]) -> dict[str, tuple[str, object]]:
    """name -> (status, detail) from earlier check_oracle / sweep logs
    (lines 'ok    name (N rows)' / 'FAIL  name: detail' /
    'TIMEOUT name (...; spark rows=N)') or a previous
    CORRECTNESS_sf1.json (incl. its oracle_timeout records — dropping
    those on merge silently upgraded rows-only evidence to absent)."""
    out: dict[str, tuple[str, object]] = {}
    for p in paths:
        if p.endswith(".json"):
            rec = json.load(open(p))
            for n in rec.get("ok", []):
                out[n] = ("ok", "")
            for n, d in rec.get("fail", {}).items():
                out[n] = ("fail", d)
            for n, rows in rec.get("oracle_timeout", {}).items():
                out[n] = ("oracle_timeout", rows)
            for n, rows in rec.get("no_oracle_rows_only", {}).items():
                out[n] = ("no_oracle", rows)
            continue
        for line in open(p):
            if line.startswith("ok    "):
                name = line.split()[1]
                out[name] = ("ok", line.strip())
            elif line.startswith("skip  "):
                # check_oracle's no-oracle rows-only record:
                # 'skip  name: no oracle (rows=N)'
                name = line.split()[1].rstrip(":")
                rows = None
                m = line.rstrip().rsplit("rows=", 1)
                if len(m) == 2:
                    try:
                        rows = int(m[1].rstrip(")"))
                    except ValueError:
                        pass
                out[name] = ("no_oracle", rows)
            elif line.startswith("FAIL  "):
                name = line.split()[1].rstrip(":")
                out[name] = ("fail", line.strip())
            elif line.startswith("TIMEOUT "):
                name = line.split()[1]
                m = line.rstrip().rsplit("rows=", 1)
                rows = None
                if len(m) == 2:
                    try:
                        rows = int(m[1].rstrip(")"))
                    except ValueError:
                        pass
                out[name] = ("oracle_timeout", rows)
    return out


def spark_rowcount(name: str, sf_dir: str, timeout: int) -> int | None:
    """Row count of the Spark side alone (rows-only evidence for
    oracle-timeout queries)."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from quasdb_spark.session import get_spark\n"
        "from quasdb_spark import suite\n"
        "spark = get_spark('sf1-rows', master='local[16]',\n"
        "    extra_conf={'spark.sql.shuffle.partitions': '16'})\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "print('ROWS=%%d' %% suite.QUERIES[%r](spark, %r).count())\n"
        % (ROOT, name, sf_dir))
    try:
        p = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                           capture_output=True, text=True,
                           timeout=timeout)
        for line in (p.stdout or "").splitlines():
            if line.startswith("ROWS="):
                return int(line.split("=", 1)[1])
    except subprocess.TimeoutExpired:
        pass
    return None


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and not args[0].startswith("--") \
        else os.path.join(ROOT, ".sf1")
    timeout = 600
    merge: list[str] = []
    only: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--timeout":
            timeout = int(args[i + 1]); i += 2
        elif args[i] == "--merge":
            i += 1
            while i < len(args) and not args[i].startswith("--"):
                merge.append(args[i]); i += 1
        elif args[i] == "--only":
            i += 1
            while i < len(args) and not args[i].startswith("--"):
                only.append(args[i]); i += 1
        else:
            i += 1

    from quasdb_spark import suite
    prior = prior_results(merge)
    # --only names re-run UNCONDITIONALLY (dropping any prior ok):
    # the flag exists to refresh evidence for queries whose code
    # changed this round — carrying a stale green forward would defeat
    # that (and silently did, until round 9).
    ok: list[str] = [n for n, (s, _) in prior.items()
                     if s == "ok" and n in suite.QUERIES
                     and n not in only]
    fail: dict[str, str] = {}
    # carry prior rows-only (oracle-timeout) evidence forward; a name
    # re-runs only when named in --only (re-paying a known-heavy
    # oracle is an explicit choice, not a merge default)
    oracle_timeout: dict[str, int | None] = {
        n: d for n, (s, d) in prior.items()
        if s == "oracle_timeout" and n in suite.QUERIES}
    # queries with NO oracle by charter (driver records rows-only):
    # the rows-only evidence is the intended record, never a FAIL
    no_oracle: dict[str, int | None] = {
        n: d for n, (s, d) in prior.items()
        if s == "no_oracle" and n in suite.QUERIES}
    protocols: dict[str, str] = {}
    for p in merge:  # carry prior segmented-protocol notes forward
        if p.endswith(".json") and os.path.exists(p):
            protocols.update({
                n: d for n, d in
                json.load(open(p)).get("protocols", {}).items()
                if n in suite.QUERIES and n not in only})
    todo = [n for n in suite.QUERIES
            if n not in ok
            and (n in only if only else
                 (n not in oracle_timeout and n not in no_oracle))]
    print(f"{len(ok)} prior ok; sweeping {len(todo)} "
          f"(budget {timeout}s each)", flush=True)
    for n in todo:
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "tools/check_oracle.py", sf_dir, n],
                cwd=ROOT, capture_output=True, text=True,
                timeout=timeout)
            out = p.stdout or ""
            if f"ok    {n}" in out:
                ok.append(n)
                oracle_timeout.pop(n, None)
                # segmented-compare evidence (check_oracle._SEGMENT)
                # is recorded per query, BENCH_sf100-protocols style:
                # bounded, and labeled as bounded
                line = next((ln for ln in out.splitlines()
                             if ln.startswith(f"ok    {n}")), "")
                if "segmented" in line:
                    protocols[n] = line.split("(", 1)[-1].rstrip(")")
                print(f"ok    {n} ({time.time() - t0:.0f}s)", flush=True)
            elif f"skip  {n}" in out:
                rows = None
                m = out.rsplit("rows=", 1)
                if len(m) == 2:
                    try:
                        rows = int(m[1].split(")")[0])
                    except ValueError:
                        pass
                no_oracle[n] = rows
                print(f"skip  {n}: no oracle (rows={rows})", flush=True)
            else:
                detail = next((ln for ln in out.splitlines()
                               if ln.startswith("FAIL")), out[-300:])
                fail[n] = detail
                print(f"FAIL  {n}: {detail[:160]}", flush=True)
        except subprocess.TimeoutExpired:
            rows = spark_rowcount(n, sf_dir, timeout)
            oracle_timeout[n] = rows
            print(f"TIMEOUT {n} (oracle budget {timeout}s exceeded; "
                  f"spark rows={rows})", flush=True)

    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                          capture_output=True, text=True).stdout.strip()
    rec = {
        "sf_dir": sf_dir, "git_head": head,
        "when": datetime.datetime.now(datetime.timezone.utc)
        .isoformat(timespec="seconds"),
        "timeout_sec": timeout,
        "ok": sorted(ok), "fail": fail,
        "oracle_timeout": oracle_timeout,
        "no_oracle_rows_only": no_oracle,
        "protocols": protocols,
        "counts": {"ok": len(ok), "fail": len(fail),
                   "oracle_timeout": len(oracle_timeout),
                   "no_oracle_rows_only": len(no_oracle),
                   "total": len(suite.QUERIES)},
    }
    with open(os.path.join(ROOT, "CORRECTNESS_sf1.json"), "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps(rec["counts"]))


if __name__ == "__main__":
    main()
