"""Local replica of the driver's correctness gate: run every query in
__spark_entry__.queries() at a given SF, run its DuckDB oracle, compare
row count, column names, and an order-insensitive multiset of
normalized row values. Usage:

    python tools/check_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import traceback
from datetime import datetime
from decimal import Decimal
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x00".join(norm_value(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    import __spark_entry__ as e
    from pqstream_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = e.queries(), e.oracle_sql()
    failed = []
    checked = 0
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        checked += 1
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc(limit=3)
            failed.append(name)
            continue
        if name not in os_:
            print(f"ok?  {name}: no oracle (rows-only) rows={len(s_rows)}")
            continue
        try:
            rel = con.sql(os_[name])
            d_cols = [c for c in rel.columns]
            d_rows = rel.fetchall()
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR")
            traceback.print_exc(limit=3)
            failed.append(name)
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not problems:
            a = norm_rows([c.lower() for c in s_cols], s_rows)
            b = norm_rows([c.lower() for c in d_cols], d_rows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"PASS {name} rows={len(s_rows)}")
    scope = "" if checked == len(qs) else f" (filtered from {len(qs)})"
    print(f"\n{checked - len(failed)}/{checked} pass{scope}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
