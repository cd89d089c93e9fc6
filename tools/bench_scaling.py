"""Two-parallelism scaling evidence (north_rule: efficiency >= 0.8 from N→4N).

Sandbox protocol (BASELINE.md §3): run the SAME job on the SAME input at
local[8] (N) and local[32] (4N), shuffle partitions scaled proportionally,
assert output parity between the runs, report throughput at both levels plus
scaling_efficiency = throughput(4N) / (4 * throughput(N)).

Jobs measured (the north_rule metric):
- crown_stem_join: PIP assignment with centroid tie-break (rows/sec of join
  output over the full stems x crowns corpus)
- tile_zonal: raster tiles extracted+aggregated (tiles/sec over the tile
  manifest, i.e. per-crown HSI stats job)

Each run is a fresh subprocess so the JVM/session is cold-started per level
(no cross-level cache pollution). Output appended to BENCH_SCALING.json and
summarized for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, ".")
from geotreehealth_spark.session import get_spark
import __spark_entry__ as E

cores = int(sys.argv[1])
sf_dir = sys.argv[2]
spark = get_spark(app_name=f"scaling-{cores}", cores=cores,
                  shuffle_partitions=4 * cores)
spark.range(1).count()  # JVM warm

out = {}
t0 = time.time()
match_rows = E.q_pip_assign_best(spark, sf_dir).count()
out["crown_stem_join"] = {"rows": match_rows, "sec": time.time() - t0}

t0 = time.time()
zr = E.q_zonal_raster(spark, sf_dir)
feat_rows = zr.count()
out["tile_zonal"] = {"rows": feat_rows, "tiles": 100, "sec": time.time() - t0}

# parity hash of the join output (order-insensitive)
from pyspark.sql import functions as F
df = E.q_pip_assign_best(spark, sf_dir)
h = df.select(F.sum(F.xxhash64(*df.columns)).alias("h")).collect()[0].h
out["join_hash"] = int(h)
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_level(cores: int, sf_dir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), sf_dir],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed (cores={cores}):\n{proc.stderr[-3000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n, n4 = 8, 32
    res_n = run_level(n, sf_dir)
    res_4n = run_level(n4, sf_dir)

    assert res_n["join_hash"] == res_4n["join_hash"], "parallelism changed results!"

    report = {"sf_dir": sf_dir, "levels": {str(n): res_n, str(n4): res_4n}, "jobs": {}}
    for job, unit_key, unit in [
        ("crown_stem_join", "rows", "join-rows/sec"),
        ("tile_zonal", "tiles", "tiles/sec"),
    ]:
        tp_n = res_n[job][unit_key] / res_n[job]["sec"]
        tp_4n = res_4n[job][unit_key] / res_4n[job]["sec"]
        report["jobs"][job] = {
            "unit": unit,
            f"throughput_{n}": round(tp_n, 2),
            f"throughput_{n4}": round(tp_4n, 2),
            "scaling_efficiency": round(tp_4n / (4.0 * tp_n), 3),
        }
    print(json.dumps(report, indent=2))
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
