"""Environment smoke check — the engine's analogue of the reference's
setup validator (/root/reference/scripts/test_setup.py:1-243, which
probes env vars, GCP credentials, package imports, GCS bucket and
vendor-API reachability before the first pipeline run). This engine has
no cloud dependencies, so the checks probe what a Spark deployment
actually needs: Java, the Python stack, a working SparkSession with the
engine's session confs, parquet round-trip, the test tables (including
the events timestamp-flavor gotcha), and the DuckDB oracle.

Run: ``python scripts/check_setup.py`` — prints one line per check,
exits 0 if every hard requirement passes, 1 otherwise.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HARD_FAILS: list[str] = []


def _report(name: str, ok: bool, detail: str = "", hard: bool = True) -> None:
    mark = "ok " if ok else ("FAIL" if hard else "warn")
    print(f"[{mark}] {name}" + (f": {detail}" if detail else ""))
    if not ok and hard:
        HARD_FAILS.append(name)


def check_java() -> None:
    home = os.environ.get("JAVA_HOME", "")
    found = bool(home and os.path.isdir(home)) or shutil.which("java")
    _report("java", bool(found), home or (shutil.which("java") or "not found"))


def check_packages() -> None:
    for mod in ("pyspark", "pyarrow", "pandas", "numpy", "duckdb"):
        try:
            m = __import__(mod)
            _report(f"python package {mod}", True, getattr(m, "__version__", ""))
        except ImportError as e:  # pragma: no cover - broken env
            _report(f"python package {mod}", False, str(e))


def check_testdata() -> str | None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    from forex_data_pipeline_spark.tables import TABLE_NAMES

    missing = [
        t for t in TABLE_NAMES
        if not os.path.exists(f"{sf_dir}/{t}.parquet")
    ]
    _report("test tables", not missing,
            f"{sf_dir} missing={missing}" if missing else sf_dir)
    return None if missing else sf_dir


def check_spark(sf_dir: str | None) -> None:
    try:
        from forex_data_pipeline_spark.session import get_spark
        spark = get_spark("check-setup")
    except Exception as e:  # pragma: no cover - broken env
        _report("spark session", False, str(e))
        return
    _report("spark session", True, spark.version)
    _report(
        "session timezone UTC",
        spark.conf.get("spark.sql.session.timeZone") == "UTC",
        hard=True,
    )
    # parquet round-trip through a temp dir (the engine's only sink)
    tmp = tempfile.mkdtemp(prefix="check_setup_")
    try:
        spark.range(100).write.mode("overwrite").parquet(f"{tmp}/t")
        n = spark.read.parquet(f"{tmp}/t").count()
        _report("parquet round-trip", n == 100, f"rows={n}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    if sf_dir:
        from forex_data_pipeline_spark.tables import load

        ev = load(spark, sf_dir, "events")
        ts_t = ev.schema["ts"].dataType.simpleString()
        ok = ts_t in ("timestamp", "timestamp_ntz")
        _report("events ts flavor handled", ok, ts_t)
        _report("events readable", ev.limit(1).count() == 1)


def check_oracle(sf_dir: str | None) -> None:
    if not sf_dir:
        return
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/nation.parquet')"
    ).fetchone()[0]
    _report("duckdb oracle scan", n > 0, f"nation rows={n}")


def main() -> int:
    check_java()
    check_packages()
    sf_dir = check_testdata()
    check_spark(sf_dir)
    check_oracle(sf_dir)
    if HARD_FAILS:
        print(f"\nFAILED: {', '.join(HARD_FAILS)}")
        return 1
    print("\nAll checks passed.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
