"""Scratch hygiene under repeated sweeps (round-7 item: a repeated
full-catalog sweep must leave the scratch root bounded).

The contract (scratch.py): every streaming/versioned query stages its
source chunks and checkpoints under ONE per-process root, swept by an
atexit hook — so N driver_sim / BENCH_QUERIES=all sweeps (N processes)
leave the temp dir exactly as found, and within a process growth is at
most linear in query invocations, never leaked to the global tmp.

Tested end-to-end with a REAL subprocess: its TMPDIR is pointed at a
fresh pytest tmp_path, it runs a checkpoint-staging streaming query
TWICE (asserting the per-run growth bound in-process), prints its
scratch root, and exits; the parent then asserts the root is gone and
the isolated TMPDIR is empty."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from forex_data_pipeline_spark import catalog
from forex_data_pipeline_spark import scratch

catalog._ensure_loaded()
fn = catalog.REGISTRY["streaming_candles_5m"].fn


def entries_and_bytes(root):
    total, count = 0, 0
    for dirpath, _dirs, files in os.walk(root):
        count += 1
        for f in files:
            p = os.path.join(dirpath, f)
            if os.path.isfile(p):
                total += os.path.getsize(p)
    return count, total


assert fn(spark, "/root/testdata/sf0.001").count() > 0
root = scratch.scratch_root()
c1, b1 = entries_and_bytes(root)
assert fn(spark, "/root/testdata/sf0.001").count() > 0
c2, b2 = entries_and_bytes(root)
# per-run growth bound: run 2 adds at most what run 1 staged (+ slack
# for checkpoint compaction metadata) — i.e. no superlinear blow-up
assert c2 <= 2 * c1 + 8, (c1, c2)
assert b2 <= 2 * b1 + (1 << 20), (b1, b2)
print("SCRATCH_ROOT=" + root, flush=True)
spark.stop()
"""


def test_repeated_sweeps_leave_tmp_bounded(tmp_path):
    env = dict(os.environ)
    env["TMPDIR"] = str(tmp_path)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD % {"repo": REPO}],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    roots = [
        ln.split("=", 1)[1]
        for ln in out.stdout.splitlines()
        if ln.startswith("SCRATCH_ROOT=")
    ]
    assert roots, out.stdout
    # the per-process root is gone after exit...
    assert not os.path.exists(roots[0])
    # ...and nothing else leaked into the isolated TMPDIR either
    leaked = [
        d
        for d in os.listdir(tmp_path)
        if d.startswith(("fx_", "fx_scratch_"))
    ]
    assert leaked == [], leaked
