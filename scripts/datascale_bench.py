#!/usr/bin/env python3
"""Data-size scaling evidence: the identical extraction job on 1x and
4x INPUT ROWS at fixed parallelism (local[32]).

The north rule's two-cluster-size criterion is covered by
scripts/scaling_bench.py (cores N -> 4N, fixed input).  This is the
complementary axis a 100 TB deployment also depends on: with the
cluster held constant, throughput (docs/sec) must stay flat as the
corpus grows — i.e. wall time linear in rows, no super-linear term
from the salted exchange, AQE re-planning, or task-scheduling
overheads.  A rate ratio (rate_4x / rate_1x) near 1.0 is the pass
signal; a ratio well below 1.0 would mean some per-job cost grows
faster than the data and would compound at 250,000x sandbox->target
scale.

Each level runs in a fresh JVM (subprocess) with best-of-2 in-JVM
timing and a /proc/stat idle gate, matching scaling_bench.py's
methodology.  Writes BENCH/datascale.json.

Usage: python scripts/datascale_bench.py [n_base] [cpus]
       (default 400000 rows, 32 cores; 4x level = 4*n_base rows)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
from pyspark.sql import functions as F
from ocr_pipeline_spark.plans.job import default_session, run_extraction

cpus, path = int(sys.argv[1]), sys.argv[2]
spark = default_session(f"local[{cpus}]", app_name=f"datascale{cpus}",
                        shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(path)
run_extraction(spark, pages.limit(2000), describe=True,
               co_locate_hosts=True).agg(F.count("*")).collect()
best, n = 1e18, 0
for _ in range(2):
    t0 = time.time()
    n = run_extraction(spark, pages, describe=True, num_partitions=cpus * 2,
                       co_locate_hosts=True).agg(F.count("*")).collect()[0][0]
    best = min(best, time.time() - t0)
print(json.dumps({"cpus": cpus, "n": n, "sec": round(best, 2),
                  "rate": round(n / best, 1)}))
spark.stop()
"""


def _wait_for_idle(threshold: float = 0.92, tries: int = 5,
                   window: float = 0.6) -> float:
    def snap():
        with open("/proc/stat") as fh:
            vals = [int(x) for x in fh.readline().split()[1:]]
        return vals[3] + vals[4], sum(vals)

    frac = 0.0
    for _ in range(tries):
        i0, t0 = snap()
        time.sleep(window)
        i1, t1 = snap()
        frac = (i1 - i0) / max(1, t1 - t0)
        if frac >= threshold:
            break
        time.sleep(4.0)
    return round(frac, 3)


def _materialize(n_pages: int) -> str:
    path = f"/tmp/spark_graft_bench/pages_n{n_pages}_s42"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from ocr_pipeline_spark.fixtures.gen_pages import generate_pages_df
        from ocr_pipeline_spark.plans.job import default_session

        spark = default_session("local[32]", app_name="gen")
        spark.sparkContext.setLogLevel("ERROR")
        generate_pages_df(spark, n_pages, 42).write.mode("overwrite").parquet(
            path
        )
        spark.stop()
    return path


def _run_level(n_pages: int, cpus: int) -> dict:
    path = _materialize(n_pages)
    idle = _wait_for_idle()
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cpus), path],
        capture_output=True, text=True, cwd=REPO, check=True,
    )
    leg = json.loads(out.stdout.strip().splitlines()[-1])
    leg["idle_frac"] = idle
    return leg


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sys.path.insert(0, REPO)

    small = _run_level(n_base, cpus)
    big = _run_level(n_base * 4, cpus)
    ratio = round(big["rate"] / small["rate"], 3)
    result = {
        "plan": "salted host co-location (north-rule default)",
        "cpus": cpus,
        "levels": {"1x": small, "4x": big},
        "rate_ratio_4x_over_1x": ratio,
    }
    with open(os.path.join(REPO, "BENCH", "datascale.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
