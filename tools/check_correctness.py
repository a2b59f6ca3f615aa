"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
stringified). Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        tuple(_norm(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(("|".join(r) + "\n").encode())
    return h.hexdigest()


def _dtype_tags(pdf: pd.DataFrame) -> dict[str, str]:
    """Column -> numeric-kind tag. The driver's hash is sensitive to
    int-vs-float (DuckDB surfaces a bare HUGEINT sum as float64, whose repr
    differs from Spark's BIGINT even when values are equal) but NOT to
    integer width (int32 row_number vs int64 hashed identically in r1).
    Tag by kind so the local gate reproduces exactly that sensitivity."""
    tags = {}
    for c in pdf.columns:
        kind = pdf[c].dtype.kind  # i/u int, f float, b bool, O object, ...
        if kind == "O":
            sample = next((v for v in pdf[c] if v is not None), None)
            if isinstance(sample, bool):
                kind = "b"
            elif isinstance(sample, int):
                kind = "i"
            elif isinstance(sample, float):
                kind = "f"
        tags[c] = {"u": "i"}.get(kind, kind)
    return tags


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok*   {name}: rows={len(spark_pdf)} (rows-only, no oracle) [{dt:.1f}s]")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        problems = []
        if len(spark_pdf) != len(oracle_pdf):
            problems.append(f"rows {len(spark_pdf)} vs {len(oracle_pdf)}")
        if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
            problems.append(
                f"cols {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
            )
        if not problems:
            st, ot = _dtype_tags(spark_pdf), _dtype_tags(oracle_pdf)
            skew = {c: (st[c], ot[c]) for c in st if st[c] != ot.get(c)}
            if skew:
                problems.append(f"dtype mismatch {skew}")
        if not problems and value_hash(spark_pdf) != value_hash(oracle_pdf):
            problems.append("value-hash mismatch")
            # show first differing rows for debugging
            a = spark_pdf[sorted(spark_pdf.columns)].astype(str).sort_values(
                by=sorted(spark_pdf.columns)
            ).reset_index(drop=True)
            b = oracle_pdf[sorted(oracle_pdf.columns)].astype(str).sort_values(
                by=sorted(oracle_pdf.columns)
            ).reset_index(drop=True)
            for i in range(min(len(a), len(b))):
                if not a.iloc[i].equals(b.iloc[i]):
                    problems.append(f"first diff row {i}:\n  spark : {a.iloc[i].to_dict()}\n  oracle: {b.iloc[i].to_dict()}")
                    break
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} [{dt:.1f}s]")
        else:
            print(f"ok    {name}: rows={len(spark_pdf)} hash-match [{dt:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
