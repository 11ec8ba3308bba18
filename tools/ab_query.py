"""Isolated fresh-session single-query timer for same-host A/B runs.

Usage: python tools/ab_query.py <query> [<query> ...]

Runs each named bench query in its OWN subprocess with a fresh
SparkSession, construction inside the timing (bench.timed_run's shape),
and prints one line per query: ``<query> <wall_sec>``. Run it
back-to-back from two git worktrees to adjudicate a regression on the
same box (see memory: bench-measurement-discipline).
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as entry_mod
from bench import bench_queries
from kafi_spark.session import get_spark

spark = get_spark("ab_query")
qs = bench_queries(entry_mod)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# warm-up: JVM/codegen startup out of the measured query
qs["scalar_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()
t0 = time.time()
df = qs[{name!r}](spark, sf_dir)
df.write.format("noop").mode("overwrite").save()
print("ABRESULT %.3f" % (time.time() - t0))
spark.stop()
"""


def run_one(name: str) -> float:
    code = _CHILD.format(repo=REPO, name=name)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=REPO, timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return float(line.split()[1])
    sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
    raise RuntimeError(f"{name}: no result")


def main() -> None:
    for name in sys.argv[1:]:
        t = run_one(name)
        print(f"{name} {t:.3f}")


if __name__ == "__main__":
    main()
