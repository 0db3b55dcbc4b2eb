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
    # the self-adjudicating re-probe must stay silent here: the default
    # baseline is an sf0.1 record, this run is sf0.001 — an sf mismatch
    # means ratios are meaningless and no re-probe may fire
    assert "reprobes" not in payload


def test_bench_reprobes_raw_exceedances_against_matching_baseline(tmp_path):
    """A query reading >2x its baseline (raw ratio, 0.5 s floor) gets
    re-probed at suite end: the record carries both readings plus the
    re-probe's paired canary under "reprobes", and the recorded timing
    is the min — so a transient host window can't ship as an
    unadjudicated exceedance (the r9 weak-count mechanism), while a
    real regression shows as reprobe≈initial on a healthy canary."""
    base = tmp_path / "baseline.json"
    base.write_text(json.dumps({
        "sf": 0.001,
        "canary_jvm_sec": 0.2,
        # absurdly low baseline => guaranteed flag for candles_5m;
        # pricing_summary has no baseline entry => must NOT be probed
        "queries": {"candles_5m": 0.001},
    }))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        BENCH_QUERIES="candles_5m,pricing_summary",
        BENCH_BASELINE=str(base),
        # zero the noise floor: candles_5m at sf0.001 runs well under
        # the production 0.5 s floor on a healthy host, and this test
        # exists to exercise the re-probe path, not host speed
        BENCH_REPROBE_FLOOR="0",
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
    payload = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][0]
    )
    assert set(payload.get("reprobes", {})) == {"candles_5m"}
    rep = payload["reprobes"]["candles_5m"]
    assert set(rep) == {"initial", "reprobe", "canary_jvm_at_reprobe"}
    assert payload["queries"]["candles_5m"] == min(
        rep["initial"], rep["reprobe"]
    )
    # total must be the sum of the FINAL per-query timings
    assert abs(
        payload["value"] - sum(payload["queries"].values())
    ) < 0.01
