"""In-corpus bigram LM perplexity columns of text_annotations
(CCNet's quality signal — Wenzek et al. 2020 score documents by LM
perplexity; the smoothed n-gram family is KenLM, Heafield 2011).

The driver corpus certifies the full column set against DuckDB every
round; these tests pin the MATH on a corpus small enough to check by
hand, plus the ordering property the signal exists for (typical text
scores lower cost than gibberish)."""

from __future__ import annotations

import math

import pytest

from pqstream_spark.sources.tables import register_views, shadow_views

SF = "/root/testdata/sf0.001"


def _annotate(spark, rows):
    import __spark_entry__ as e

    register_views(spark, SF)
    docs = spark.createDataFrame(
        rows, "doc_id LONG, lang STRING, text STRING"
    )
    with shadow_views(spark, documents=docs):
        return {
            r["doc_id"]: r
            for r in e.queries()["text_annotations"](spark, SF).collect()
        }


def test_lm_hand_computed_exact(spark):
    """corpus: 'a b', 'a b', 'a c' → unigrams a×3 b×2 c×1 (V=3),
    BOS×3; bigrams (<s>,a)×3 (a,b)×2 (a,c)×1. Laplace bigram cost in
    micro-nats: ln(c_prefix + V) − ln(c_bigram + 1)."""
    out = _annotate(
        spark, [(1, "en", "a b"), (2, "en", "a b"), (3, "en", "a c")]
    )
    m = 1_000_000
    c_bos_a = round((math.log(3 + 3) - math.log(3 + 1)) * m)  # 405465
    c_a_b = round((math.log(3 + 3) - math.log(2 + 1)) * m)    # 693147
    c_a_c = round((math.log(3 + 3) - math.log(1 + 1)) * m)    # 1098612

    assert out[1]["lm_bigrams"] == 2
    assert out[1]["lm_avg_cost_mnats"] == (c_bos_a + c_a_b) // 2
    assert out[3]["lm_avg_cost_mnats"] == (c_bos_a + c_a_c) // 2
    assert out[1]["lm_ppl"] == round(
        math.exp((c_bos_a + c_a_b) / 2 / m), 2
    )
    # identical docs score identically; the rarer continuation costs more
    assert out[1]["lm_avg_cost_mnats"] == out[2]["lm_avg_cost_mnats"]
    assert out[3]["lm_avg_cost_mnats"] > out[1]["lm_avg_cost_mnats"]


def test_lm_typical_beats_gibberish(spark):
    """Documents made of the corpus's common transitions land at lower
    perplexity than a document of one-off tokens — the head/tail split
    CCNet's curation relies on."""
    common = "the cat sat on the mat"
    rows = [(i, "en", common) for i in range(1, 9)]
    rows.append((100, "en", "zq xv qqj wkp zzv mmx"))
    out = _annotate(spark, rows)
    assert out[1]["lm_ppl"] < out[100]["lm_ppl"]
    assert out[1]["lm_avg_cost_mnats"] < out[100]["lm_avg_cost_mnats"]


def test_lm_edge_docs(spark):
    """Single-token doc carries exactly the BOS bigram; a doc with no
    tokens has no LM row (0 bigrams, NULL cost/ppl)."""
    out = _annotate(
        spark,
        [(1, "en", "hello"), (2, "en", "!!! ..."), (3, "en", "hello world")],
    )
    assert out[1]["lm_bigrams"] == 1
    assert out[2]["lm_bigrams"] == 0
    assert out[2]["lm_avg_cost_mnats"] is None
    assert out[2]["lm_ppl"] is None
    assert out[3]["lm_bigrams"] == 2


def test_lm_gate_form_stays_narrow(spark):
    """The lm=False form (streaming ingest gate) must not emit LM
    columns and must not reference the lm relations."""
    from pqstream_spark.queries.llm import _annotations_sql

    sql = _annotations_sql(True, lm=False)
    assert "lm_ppl" not in sql and "lmexc" not in sql
    register_views(spark, SF)
    cols = spark.sql(sql).columns
    assert "lm_ppl" not in cols and "simhash" in cols
