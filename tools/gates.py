"""Builder-side gate record: run the full pytest suite and the full
DuckDB-oracle check, and write GATES_r{N}.json at the repo root — a
self-reported, timestamped artifact proving both gates ran on the
committed code even if the external driver skips a round (rounds
r05→r07 have no driver artifacts for r6; this closes that hole from
the builder side).

Usage: python tools/gates.py <round> [sf_dir]
Writes: GATES_r{round:02d}.json with
  {"round", "git_head", "when", "pytest": {...}, "oracle": {...}}
"""

from __future__ import annotations

import datetime
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_pytest() -> dict:
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=no"],
        cwd=ROOT, capture_output=True, text=True)
    tail = (p.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else ""
    m = re.search(r"(\d+) passed", summary)
    f = re.search(r"(\d+) failed", summary)
    return {"exit_code": p.returncode,
            "passed": int(m.group(1)) if m else 0,
            "failed": int(f.group(1)) if f else 0,
            "summary": summary, "wall_sec": round(time.time() - t0, 1)}


def run_oracle(sf_dir: str) -> dict:
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "tools/check_oracle.py", sf_dir],
        cwd=ROOT, capture_output=True, text=True)
    out = (p.stdout or "")
    ok = len(re.findall(r"^ok\s", out, re.M))
    fails = re.findall(r"^FAIL\s+(\S+)", out, re.M)
    return {"exit_code": p.returncode, "ok": ok, "failed": fails,
            "sf_dir": sf_dir, "wall_sec": round(time.time() - t0, 1)}


def run_plan_report() -> dict:
    """Regenerate PLANS.md as part of the gate (VERDICT r14 board #4:
    the plan-shape evidence must not lag the shipping code by a round
    — r14's PLANS.md was one gate-commit stale). The gate record
    carries the outcome so a failed regeneration is visible, not
    silent."""
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "tools/plan_report.py"],
        cwd=ROOT, capture_output=True, text=True)
    return {"exit_code": p.returncode,
            "summary": (p.stdout or p.stderr or "").strip()[-200:],
            "wall_sec": round(time.time() - t0, 1)}


def main() -> None:
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                          capture_output=True, text=True).stdout.strip()
    rec = {"round": rnd, "git_head": head,
           "when": datetime.datetime.now(datetime.timezone.utc)
           .isoformat(timespec="seconds"),
           "pytest": run_pytest(), "oracle": run_oracle(sf_dir),
           "plans_md": run_plan_report()}
    path = os.path.join(ROOT, f"GATES_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps(rec["pytest"]))
    print(json.dumps({k: rec["oracle"][k] for k in
                      ("ok", "failed", "wall_sec")}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
