"""One-shot round-closing verification — codifies the checklist every
round runs by hand before handing the repo to the driver:

  1. registry sanity (prefix size/membership/order, oracle completeness)
  2. oracle hygiene (every oracle EXPLAINs in DuckDB — seconds)
  3. full oracle battery at sf0.001 AND sf0.01 (the driver-gate mirror)
  4. driver contract (entry(), queries(), oracle_sql()) under a VANILLA
     session, plus the mq-source batch smoke
  5. bench at $SPARK_GRAFT_SF_DIR (one JSON line)

Usage (from the repo root; takes ~45-60 min dominated by the batteries):

    python tools/verify_all.py            # everything
    python tools/verify_all.py --quick    # skip the sf0.01 battery+bench

Exit code 0 only if every stage passes. Stages run as subprocesses so a
JVM crash in one cannot take down the report.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(label: str, argv: list[str], timeout: int) -> bool:
    print(f"== {label} ==", flush=True)
    try:
        r = subprocess.run(
            argv, cwd=REPO, timeout=timeout, capture_output=True, text=True
        )
    except subprocess.TimeoutExpired:
        print(f"   TIMEOUT after {timeout}s")
        return False
    tail = "\n".join((r.stdout + r.stderr).strip().splitlines()[-3:])
    print("   " + tail.replace("\n", "\n   "))
    return r.returncode == 0


def stage_registry() -> bool:
    from spark_sql_custom_mq_datasource_spark.plans.registry import (
        _PRIORITY,
        get_oracles,
        get_queries,
    )

    qs = get_queries()
    ok = (
        len(_PRIORITY) == 50
        and all(n in qs for n in _PRIORITY)
        and list(qs)[:50] == list(_PRIORITY)
        and len(get_oracles()) == len(qs)
    )
    print(f"== registry == {len(qs)} queries, prefix ok: {ok}")
    return ok


def main() -> None:
    quick = "--quick" in sys.argv
    py = sys.executable
    results = [("registry", stage_registry())]
    results.append(
        (
            "oracle-hygiene",
            run(
                "oracle hygiene",
                [py, "-m", "pytest", "tests/test_contract.py", "-q",
                 "-k", "OracleHygiene"],
                600,
            ),
        )
    )
    results.append(
        (
            "battery-sf0.001",
            run(
                "battery sf0.001",
                [py, "tools/check_oracles.py", "/root/testdata/sf0.001"],
                3600,
            ),
        )
    )
    if not quick:
        results.append(
            (
                "battery-sf0.01",
                run(
                    "battery sf0.01",
                    [py, "tools/check_oracles.py", "/root/testdata/sf0.01"],
                    3600,
                ),
            )
        )
    contract = (
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[8]')\n"
        "  .config('spark.ui.showConsoleProgress','false').getOrCreate())\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "import __spark_entry__ as e\n"
        "assert len(e.entry(spark).collect()) > 0\n"
        "assert len(e.queries()) == len(e.oracle_sql())\n"
        "from spark_sql_custom_mq_datasource_spark.session import register_mq_source\n"
        "register_mq_source(spark)\n"
        "n = (spark.read.format('mq').option('startingTimestamp',0)\n"
        "     .option('endingTimestamp',200).load().count())\n"
        "assert n > 0\n"
        "print('driver contract ok,', len(e.queries()), 'queries')\n"
    )
    results.append(
        ("driver-contract", run("driver contract", [py, "-c", contract], 900))
    )
    if not quick:
        results.append(("bench", run("bench", [py, "bench.py"], 1500)))

    print("\n== SUMMARY ==")
    for name, ok in results:
        print(f"  {'PASS' if ok else 'FAIL'}  {name}")
    sys.exit(0 if all(ok for _, ok in results) else 1)


if __name__ == "__main__":
    main()
