"""Local mirror of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB at
the given SF, compares row count, sorted-column names, and an
order-insensitive value representation. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import re
import sys
import time
import traceback

import duckdb
import pyarrow as pa


def _canon_arrow_type(t: pa.DataType) -> str:
    """Canonical type token for an Arrow type (DuckDB result side)."""
    if pa.types.is_int64(t):
        return "i64"
    if pa.types.is_int32(t):
        return "i32"
    if pa.types.is_int16(t):
        return "i16"
    if pa.types.is_int8(t):
        return "i8"
    if pa.types.is_float64(t):
        return "f64"
    if pa.types.is_float32(t):
        return "f32"
    if pa.types.is_decimal(t):
        return f"dec({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_arrow_type(t.value_type)}>"
    return str(t)


_SPARK_CANON = {
    "bigint": "i64",
    "int": "i32",
    "smallint": "i16",
    "tinyint": "i8",
    "double": "f64",
    "float": "f32",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "binary": "bin",
}


def _canon_spark_type(s: str) -> str:
    """Canonical type token for a Spark simpleString type."""
    s = s.strip()
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", s)
    if m:
        return f"dec({m.group(1)},{m.group(2)})"
    m = re.fullmatch(r"array<(.*)>", s)
    if m:
        return f"list<{_canon_spark_type(m.group(1))}>"
    return _SPARK_CANON.get(s, s)


def _type_mismatches(spark_schema, duck_arrow_schema) -> list[str]:
    """The driver hashes TYPED values, so DuckDB HUGEINT/DECIMAL vs Spark
    BIGINT/DOUBLE hash-mismatch even when the numbers are equal. Compare
    canonical types per column name."""
    duck = {f.name: _canon_arrow_type(f.type) for f in duck_arrow_schema}
    bad = []
    for f in spark_schema.fields:
        st = _canon_spark_type(f.dataType.simpleString())
        dt = duck.get(f.name)
        if dt is not None and st != dt:
            bad.append(f"{f.name}: spark={st} duck={dt}")
    return bad


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v!r}"
    if v is None:
        return "∅"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    if os.environ.get("CHECK_VANILLA"):
        # Driver-fidelity mode: a bare session like the external gate's —
        # no AQE/Arrow/UTC/memory confs from session.builder_conf.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-vanilla")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        from spark_sql_custom_mq_datasource_spark.session import get_spark

        spark = get_spark("oracle-check")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            srows = df.collect()
            scols = df.columns
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows  ({dt:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            dtab = con.execute(oracles[name]).arrow()
            drows = [tuple(r.values()) for r in dtab.to_pylist()]
            dcols = dtab.schema.names
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1
            continue
        tbad = _type_mismatches(df.schema, dtab.schema)
        if tbad:
            print(f"FAIL {name}: TYPE MISMATCH {tbad}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        sc, dc = _canon([tuple(r) for r in srows], scols), _canon(drows, dcols)
        if sc != dc:
            bad = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(srows)} rows  ({dt:.1f}s)")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
