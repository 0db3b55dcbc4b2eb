"""bench.py is a driver-facing contract: exactly one JSON line on
stdout with the agreed keys, exit code 0. Run it as a subprocess at
sf0.001 (fast) exactly the way the round driver runs it at sf0.1."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line_with_contract_keys():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        BENCH_QUERIES="candles_5m,pricing_summary",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert len(json_lines) == 1, proc.stdout[-2000:]
    payload = json.loads(json_lines[0])
    assert set(payload) >= {"metric", "value", "unit", "queries", "sf"}
    assert payload["unit"] == "sec"
    assert payload["value"] > 0
    assert set(payload["queries"]) == {"candles_5m", "pricing_summary"}
    assert all(v >= 0 for v in payload["queries"].values())
