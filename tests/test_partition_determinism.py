"""SURVEY.md §5 plan item 4: results must not depend on partition count.

Runs the same representative queries (kNN — driver-loop + window ranking,
greedy NMS — sequential-parity fixpoint, and dup_components — label-
propagation fixpoint, the third driver-loop iterative path) in two fresh
subprocesses at
local[2]/shuffle=2 and local[8]/shuffle=8 and asserts the sorted row dumps are
byte-identical. Subprocesses because a JVM allows one SparkContext; the two
runs must genuinely build separate sessions with different parallelism.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import hashlib, sys
sys.path.insert(0, {repo!r})
from geotreehealth_spark.session import get_spark
import __spark_entry__ as entry

cores, shuffle = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(app_name=f"pdet-{{cores}}", cores=cores,
                  shuffle_partitions=shuffle)
qs = entry.queries()
for name in ("knn", "nms_greedy", "dup_components"):
    df = qs[name](spark, "/root/testdata/sf0.001")
    rows = sorted(tuple(r) for r in df.collect())
    digest = hashlib.sha256(repr(rows).encode()).hexdigest()
    print(f"RESULT {{name}} {{len(rows)}} {{digest}}", flush=True)
spark.stop()
"""


def _run(cores: int, shuffle: int) -> dict[str, str]:
    proc = subprocess.run(
        [sys.executable, "-c", RUNNER.format(repo=REPO), str(cores), str(shuffle)],
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = {}
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            _, name, n, digest = line.split()
            out[name] = (int(n), digest)
    assert set(out) == {"knn", "nms_greedy", "dup_components"}, proc.stdout[-2000:]
    return out


def test_partition_count_determinism():
    lo = _run(cores=2, shuffle=2)
    hi = _run(cores=8, shuffle=8)
    assert lo == hi, f"partition-count-dependent results: {lo} vs {hi}"
