"""Dump .explain('formatted') for every headline query into
plans/<round>/<name>_<tag>.txt (judge evidence; round from PLANS_ROUND, default r15).

Usage: python tools/dump_plans.py <tag> [name ...]
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    tag = sys.argv[1]
    only = sys.argv[2:]

    from bench import HEADLINE

    from pqstream_spark.queries import build_catalog
    from pqstream_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    queries, _ = build_catalog()
    outdir = REPO / "plans" / __import__("os").environ.get("PLANS_ROUND", "r15")
    outdir.mkdir(parents=True, exist_ok=True)
    for n in HEADLINE:
        if only and n not in only:
            continue
        if n not in queries:
            continue
        df = queries[n](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{n}_{tag}.txt").write_text(buf.getvalue())
        print(f"wrote {n}_{tag}.txt ({len(buf.getvalue())} bytes)",
              flush=True)


if __name__ == "__main__":
    main()
