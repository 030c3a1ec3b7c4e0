#!/usr/bin/env python3
"""One-command repo verification (r12 verdict prescription #6):

    python3 tools/verify_all.py [--skip-bench]

Runs, in order, and emits ONE machine-parseable JSON verdict line at
the end (exit 0 only if every stage is green):

  1. `sbt -batch test`                       — the full ScalaTest suite;
  2. `sbt -batch "runMain graft.Verify /root/testdata/sf0.01 <tmp>"`
     — materializes every registered query + its oracle SQL;
  3. `tools/check.py` — DuckDB oracle compare (the driver's
     correctness gate, replicated locally);
  4. a bounded bench smoke at sf0.1 (`graft.Bench`, full suite, one
     JVM) — catches a query that went 10x slow or started failing
     under bench conditions. `--skip-bench` drops this stage (~5 min).

Wall cost ~20-30 min all-in on this host. Driver-side deps only
(duckdb for the oracle) — dev tooling, not part of the library.
"""
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(stage, cmd, log, env=None):
    t0 = time.time()
    e = dict(os.environ)
    if env:
        e.update(env)
    with open(log, "w") as f:
        p = subprocess.run(cmd, cwd=REPO, stdout=f,
                           stderr=subprocess.STDOUT, env=e)
    sec = round(time.time() - t0, 1)
    print(f"[verify_all] {stage}: exit {p.returncode} in {sec}s ({log})",
          file=sys.stderr)
    return p.returncode, sec


def main():
    skip_bench = "--skip-bench" in sys.argv
    out = {"verdict": "green"}
    vdir = tempfile.mkdtemp(prefix="graft-verify-")

    rc, sec = run("sbt test", ["sbt", "-batch", "test"],
                  "/tmp/verify_all_test.log")
    out["tests"] = {"ok": rc == 0, "sec": sec}

    rc2, sec2 = run(
        "graft.Verify sf0.01",
        ["sbt", "-batch", f"runMain graft.Verify /root/testdata/sf0.01 {vdir}"],
        "/tmp/verify_all_verify.log")
    out["verify"] = {"ok": rc2 == 0, "sec": sec2, "dir": vdir}

    if rc2 == 0:
        rc3, sec3 = run(
            "oracle check",
            [sys.executable, "tools/check.py", "/root/testdata/sf0.01", vdir],
            "/tmp/verify_all_oracle.log")
        tail = open("/tmp/verify_all_oracle.log").read()
        m = re.search(r"(\d+) ok, (\d+) bad", tail)
        out["oracle"] = {"ok": rc3 == 0, "sec": sec3,
                         "n_ok": int(m.group(1)) if m else -1,
                         "n_bad": int(m.group(2)) if m else -1}
    else:
        out["oracle"] = {"ok": False, "skipped": "verify failed"}

    if skip_bench:
        out["bench"] = {"skipped": True}
    else:
        rc4, sec4 = run(
            "bench smoke sf0.1",
            ["sbt", "-batch", "runMain graft.Bench"],
            "/tmp/verify_all_bench.log",
            env={"SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
                 "SPARK_GRAFT_CPUS": "32"})
        bench_ok = rc4 == 0
        total = failed = None
        try:
            line = [l for l in open("/tmp/graft_bench_out.json")
                    if '"metric"' in l][0]
            b = json.loads(line)
            total, failed = round(b["value"], 1), b["failed"]
            bench_ok = bench_ok and not failed
        except Exception as e:
            bench_ok = False
            failed = f"unparseable: {e}"
        out["bench"] = {"ok": bench_ok, "sec": sec4, "total_sec": total,
                        "failed": failed}

    green = all(v.get("ok", True) for v in out.values()
                if isinstance(v, dict))
    out["verdict"] = "green" if green else "RED"
    print(json.dumps(out, separators=(",", ":")))
    return 0 if green else 1


if __name__ == "__main__":
    sys.exit(main())
