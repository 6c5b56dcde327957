"""`python -m pqstream_spark.curate` — the batch curation driver: point
the engine at a parquet/CSV of documents and get back a curated
training corpus.

    python -m pqstream_spark.curate --documents docs.parquet --out corpus/
    python -m pqstream_spark.curate --documents docs.parquet --out corpus/ \
        --near-dedup --min-clf 0.0

What runs (all of it the same code the oracle-checked catalog entries
run — this CLI is a thin driver, not a second implementation):

- `text_curation_pipeline`'s one-scan annotate → language-ID → quality
  → linear-classifier margin → exact-dup canonicalization → hash
  splits (80/10/10) → per-language mixture sampling → sequence packing
  (queries/llm._curation_sql);
- optionally (`--near-dedup`) the LSH → Jaccard-verify → connected
  components near-dup pass (queries/llm.dedup_corpus) — the keeper per
  near-dup cluster joins the keep rule;
- output written partitioned by `split` (train/val/test directories a
  training job reads directly), plus ONE JSON stats line on stdout.

Input contract: a `text` column. `doc_id` is taken if present, else
derived as xxhash64(text) — deterministic, and identical texts
colliding onto one id is harmless because they are exact dups by
definition. `lang` is taken if present (the mixture weights key on it,
detector fills gaps), else NULL.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m pqstream_spark.curate",
        description="curate a document corpus for training",
    )
    p.add_argument("--documents", required=True,
                   help="input path (.parquet, or .csv with a header)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--near-dedup", action="store_true",
                   help="also run the LSH near-dup pass (exact-dup "
                   "canonicalization always runs)")
    p.add_argument("--min-clf", type=float, default=0.0,
                   help="minimum classifier margin to keep (default 0.0 "
                   "= clf_keep; lower admits more)")
    p.add_argument("--cpus", type=int, default=None,
                   help="local[N] cores (default: all)")
    return p


def curate(spark, docs, near_dedup: bool = False, min_clf: float = 0.0):
    """The composition, as a library call: returns the annotated frame
    with a `final_keep` column. `docs` needs (text) and optionally
    (doc_id, lang)."""
    from pyspark.sql import functions as F

    from .queries.llm import _curation_sql, dedup_corpus

    if "doc_id" not in docs.columns:
        docs = docs.withColumn("doc_id", F.expr("xxhash64(text)"))
    if "lang" not in docs.columns:
        docs = docs.withColumn("lang", F.lit(None).cast("string"))
    docs = docs.select("doc_id", "lang", "text")
    # unique view name: shadowing the shared `documents` catalog view
    # from a library call would serve this input to every later catalog
    # query in the session (the exact foot-gun sources/tables documents)
    import uuid as _uuid

    view = f"_curate_docs_{_uuid.uuid4().hex[:8]}"
    docs.createOrReplaceTempView(view)
    cur = spark.sql(_curation_sql(True, src=view))
    spark.catalog.dropTempView(view)
    if near_dedup:
        nd = dedup_corpus(docs.select("doc_id", "text")).select(
            "doc_id",
            F.col("cluster_keeper").alias("near_dup_keeper"),
            F.col("kept").alias("near_dup_kept"),
        )
        cur = cur.join(nd, "doc_id", "left").withColumn(
            "near_dup_kept", F.coalesce("near_dup_kept", F.lit(True))
        )
    else:
        cur = cur.withColumn(
            "near_dup_keeper", F.lit(None).cast("long")
        ).withColumn("near_dup_kept", F.lit(True))
    return cur.withColumn(
        "final_keep",
        F.expr(f"kept AND mix_keep AND clf_margin >= {min_clf} "
               "AND near_dup_kept"),
    )


def main(argv: list[str] | None = None, out=None) -> int:
    args = build_parser().parse_args(argv)
    out = out if out is not None else sys.stdout

    from pyspark.sql import functions as F

    from .session import get_spark

    spark = get_spark("pqstream-curate", cpus=args.cpus)
    if args.documents.endswith(".csv"):
        docs = spark.read.option("header", "true").csv(args.documents)
    else:
        docs = spark.read.parquet(args.documents)
    if "text" not in docs.columns:
        print(f"--documents: no `text` column in {args.documents}",
              file=sys.stderr)
        return 1

    cur = curate(spark, docs, near_dedup=args.near_dedup,
                 min_clf=args.min_clf)
    cur.write.mode("overwrite").partitionBy("split").parquet(args.out)

    # stats from what was WRITTEN (one extra scan of the small output,
    # not a second run of the pipeline)
    written = spark.read.parquet(args.out)
    agg = written.agg(
        F.count("*").alias("docs"),
        F.sum(F.expr("CAST(final_keep AS INT)")).alias("kept"),
        F.sum(F.expr("CAST(NOT kept AS INT)")).alias("rej_quality_or_dup"),
        F.sum(F.expr("CAST(kept AND clf_margin < "
                     f"{args.min_clf} AS INT)")).alias("rej_classifier"),
        F.sum(F.expr("CAST(kept AND NOT near_dup_kept AS INT)")).alias(
            "rej_near_dup"),
        F.sum(F.expr("CAST(kept AND NOT mix_keep AS INT)")).alias(
            "rej_mixture"),
    ).collect()[0]
    splits = {
        r["split"]: r["n"]
        for r in written.filter("final_keep").groupBy("split")
        .agg(F.count("*").alias("n")).collect()
    }
    print(json.dumps({
        "docs": agg["docs"],
        "kept": int(agg["kept"] or 0),
        "rejected": {
            "quality_or_exact_dup": int(agg["rej_quality_or_dup"] or 0),
            "classifier": int(agg["rej_classifier"] or 0),
            "near_dup": int(agg["rej_near_dup"] or 0),
            "mixture_sampled_out": int(agg["rej_mixture"] or 0),
        },
        "kept_by_split": splits,
        "out": args.out,
    }, separators=(",", ":")), file=out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
