"""Poison-input tolerance: at 100 TB there WILL be malformed rows; the
pipeline must degrade per-row (NULLs), never fail the job."""

from __future__ import annotations

from pyspark.sql import functions as F

from pqstream_spark.operators.merge_patch import merge_patch_json
from pqstream_spark.sources.changelog import changelog_from_events


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_changelog_survives_malformed_props(spark):
    from datetime import datetime

    ts = datetime(2024, 1, 1)
    rows = [
        (1, ts, 10, "click", 1.0, '{"k": 5}'),          # good
        (2, ts, 11, "view", 2.0, "not json at all"),     # poison
        (3, ts, 12, "signup", 3.0, None),                # null props
        (4, ts, 13, "purchase", 4.0, '{"k": "zzz"}'),    # wrong type
        (5, ts, 14, "error", None, '{"k": 7}'),          # null value
    ]
    out = {r["seq"]: r for r in changelog_from_events(_events(spark, rows)).collect()}
    assert len(out) == 5  # nothing dropped, nothing crashed
    assert out[1]["payload"]["note"] == "note-5"
    # malformed/missing/wrong-typed props → NULL k → note-NULL rendering,
    # envelope intact
    for seq in (2, 3, 4):
        assert out[seq]["table_name"] is not None
        assert out[seq]["op"] is not None
        assert out[seq]["payload"]["note"] is None
    assert out[5]["payload"]["val"] is None  # null value survives


def test_merge_patch_json_udf_poison(spark):
    df = spark.createDataFrame(
        [
            (1, '{"a": 1}', '{"a": 2}'),
            (2, "{broken", '{"a": 2}'),      # bad a-side
            (3, '{"a": 1}', "ALSO BROKEN"),  # bad b-side
            (4, None, None),
        ],
        "i int, a string, b string",
    )
    out = {
        r["i"]: r["p"]
        for r in df.select(
            "i", merge_patch_json(F.col("a"), F.col("b")).alias("p")
        ).collect()
    }
    assert out[1] == '{"a":2}'
    # parity with server.go:237-240: patch error → event still flows,
    # changes just absent (NULL)
    assert out[2] is None and out[3] is None
    assert out[4] == "{}"


def test_text_pipeline_survives_degenerate_documents(spark):
    """Empty corpus, empty strings, whitespace-only, no-alpha, and
    unicode-heavy docs must flow through annotate/curate/chunk/dedup
    without errors (shingling of <3 tokens, ratios over zero-token
    docs, md5 of empty strings are all edge paths)."""
    import __spark_entry__ as e

    from pqstream_spark.sources.tables import register_views, shadow_views

    register_views(spark, "/root/testdata/sf0.001")
    rows = [
        (1, "en", ""),
        (2, "en", "   "),
        (3, "en", "!!! ??? ..."),
        (4, "zh", "中文文本 没有拉丁"),
        (5, "en", "one"),
        (6, "en", "two tokens"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, lang STRING, text STRING")
    qs = e.queries()
    with shadow_views(spark, documents=docs):
        for name in (
            "text_annotations",
            "text_curation_pipeline",
            "text_chunking",
            "dedup_exact",
            "dedup_minhash_lsh",
        ):
            # collect(), NOT count(): count() lets Catalyst prune every
            # projection, so an ANSI DIVIDE_BY_ZERO inside a ratio
            # column passes the test while crashing any real consumer
            # (this masked exactly that bug in quality_score/alpha_ratio
            # on zero-token/empty docs — caught in review)
            qs[name](spark, "/root/testdata/sf0.001").collect()


def test_similarity_survives_empty_and_zero_vectors(spark):
    """Empty embeddings table → similarity entries return 0 rows; a
    zero vector (norm 0 → division yields NaN cosine) must not crash
    any path, and the quantized path's scale>0 guard drops it."""
    import __spark_entry__ as e

    from pqstream_spark.sources.tables import register_views, shadow_views

    register_views(spark, "/root/testdata/sf0.001")
    qs = e.queries()
    sim = ["sim_topk_brute_ivf", "sim_ann_lsh_quantized", "dedup_pairwise_scores"]

    empty = spark.createDataFrame(
        [], "vec_id LONG, label STRING, embedding ARRAY<DOUBLE>"
    )
    with shadow_views(spark, embeddings=empty):
        for name in sim:
            qs[name](spark, "/root/testdata/sf0.001").count()

    register_views(spark, "/root/testdata/sf0.001")
    rows = [
        (1, "a", [0.0] * 8),           # zero vector: norm 0
        (2, "a", [1.0] * 8),
        (3, "a", [1.0, 0.0] * 4),
        (11, "b", [2.0] * 8),
        (12, "b", [0.5] * 8),
    ]
    zv = spark.createDataFrame(
        rows, "vec_id LONG, label STRING, embedding ARRAY<DOUBLE>"
    )
    with shadow_views(spark, embeddings=zv):
        for name in sim:
            qs[name](spark, "/root/testdata/sf0.001").count()


def test_gopher_quality_signals_exact_values(spark):
    """The Gopher-style repetition/format columns (dup_line_frac,
    bullet_line_frac, ellipsis_line_frac, symbol_word_ratio) compute
    exact fractions on crafted text — the driver corpus has no
    newlines/bullets, so its oracle certification of these columns is
    vacuous (all 0.0) and the real logic is pinned here."""
    import __spark_entry__ as e

    from pqstream_spark.sources.tables import register_views, shadow_views

    register_views(spark, "/root/testdata/sf0.001")
    rows = [
        # 4 lines, one exact duplicate -> dup 1/4; one bullet; one
        # ellipsis-ended; '#' twice over 8 tokens
        (1, "en", "alpha beta # line\nalpha beta # line\n- bullet x\nend it..."),
        (2, "en", "no repetition here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, lang STRING, text STRING")
    with shadow_views(spark, documents=docs):
        out = {
            r["doc_id"]: r
            for r in e.queries()["text_annotations"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
    r1 = out[1]
    assert r1["dup_line_frac"] == 0.25, r1["dup_line_frac"]
    assert r1["bullet_line_frac"] == 0.25
    assert r1["ellipsis_line_frac"] == 0.25
    # '#' appears twice; tokenizer yields 12 tokens
    assert r1["symbol_word_ratio"] == round(2 / r1["n_tokens"], 6)
    r2 = out[2]
    assert r2["dup_line_frac"] == 0.0
    assert r2["bullet_line_frac"] == 0.0 and r2["symbol_word_ratio"] == 0.0


def test_clf_margin_exact_and_discriminative(spark):
    """The linear quality-classifier head in text_curation_pipeline:
    margin = (4*q_micro + 3*a_micro + 40000*min(n_tokens,200)
              - 4_200_000) / 2e6  (weights 2.0/1.5/0.02, bias -2.1,
    computed in integer micro-units so Spark and DuckDB agree bit-for-
    bit). Pinned on crafted text: a stopword-rich alpha-pure doc
    clears the boundary, a short symbol-soup doc fails it."""
    import __spark_entry__ as e

    from pqstream_spark.sources.tables import register_views, shadow_views

    register_views(spark, "/root/testdata/sf0.001")
    rows = [
        (1, "en", "the a and of is " * 40),   # 200 stopword tokens
        (2, "en", "#### 1234 %%%% !!!!"),     # no alpha, no stopwords
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, lang STRING, text STRING")
    with shadow_views(spark, documents=docs):
        out = {
            r["doc_id"]: r
            for r in e.queries()["text_curation_pipeline"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
    r1, r2 = out[1], out[2]
    # doc 1: quality = 0.5*1.0 + 0.5*1.0 = 1.0; alpha_ratio from its
    # exact text; margin = (4e6*1 + 3*a + 40000*200 - 4.2e6)/2e6
    a1 = round(r1["alpha_ratio"] * 1_000_000)
    want1 = (4_000_000 + 3 * a1 + 40_000 * 200 - 4_200_000) / 2_000_000.0
    assert r1["clf_margin"] == want1 and r1["clf_keep"] is True
    # doc 2: zero stopwords, zero alpha, few tokens -> fails
    assert r2["clf_keep"] is False and r2["clf_margin"] < 0
