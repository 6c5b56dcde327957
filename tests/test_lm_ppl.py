"""In-corpus bigram LM perplexity columns of text_annotations
(CCNet's quality signal — Wenzek et al. 2020 score documents by LM
perplexity; the smoothed n-gram family is KenLM, Heafield 2011).

The driver corpus certifies the full column set against DuckDB every
round; these tests pin the MATH on a corpus small enough to check by
hand, plus the ordering property the signal exists for (typical text
scores lower cost than gibberish)."""

from __future__ import annotations

import math

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


def test_corpus_lm_self_scoring_matches_annotations(spark):
    """score_against_corpus_lm over the SAME corpus its tables were
    built from must reproduce text_annotations' certified in-corpus LM
    columns exactly — one model family, two surfaces (the
    CLF_MARGIN_EXPR discipline)."""
    from pqstream_spark.queries.llm import (
        corpus_lm_tables,
        score_against_corpus_lm,
    )
    from pqstream_spark.sources.tables import load_table

    corpus = load_table(spark, SF, "documents").selectExpr(
        "doc_id", "lang", "text"
    )
    bgc, uni, vsz = corpus_lm_tables(corpus)
    got = {
        r["doc_id"]: (r["lm_bigrams"], r["lm_avg_cost_mnats"], r["lm_ppl"])
        for r in score_against_corpus_lm(corpus, bgc, uni, vsz).collect()
    }

    import __spark_entry__ as e

    want = {
        r["doc_id"]: (r["lm_bigrams"], r["lm_avg_cost_mnats"], r["lm_ppl"])
        for r in e.queries()["text_annotations"](spark, SF).collect()
    }
    assert got == want


def test_corpus_lm_unseen_bigrams_hand_computed(spark):
    """Scoring OUT-OF-CORPUS text: corpus 'a b' ×2 → unigrams a×2 b×2
    (V=2), BOS×2; bigrams (<s>,a)×2 (a,b)×2. Doc 'a q' pays the seen
    BOS cost plus the unseen-continuation cost ln(c_a + V) − ln(0+1);
    doc 'q z' pays ln(c_BOS + V) for the unseen BOS continuation (BOS
    itself is always a known prefix) and ln(0 + V) for the fully-
    unseen (q, z)."""
    from pqstream_spark.queries.llm import (
        corpus_lm_tables,
        score_against_corpus_lm,
    )

    corpus = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id LONG, text STRING"
    )
    bgc, uni, vsz = corpus_lm_tables(corpus)
    assert vsz == 2
    docs = spark.createDataFrame(
        [(10, "a q"), (11, "q z")], "doc_id LONG, text STRING"
    )
    out = {
        r["doc_id"]: r
        for r in score_against_corpus_lm(docs, bgc, uni, vsz).collect()
    }
    m = 1_000_000
    c_bos_a = round((math.log(2 + 2) - math.log(2 + 1)) * m)
    c_a_q = round((math.log(2 + 2) - math.log(0 + 1)) * m)
    c_bos_q = round((math.log(2 + 2) - math.log(0 + 1)) * m)
    c_q_z = round((math.log(0 + 2) - math.log(0 + 1)) * m)  # ln(V)
    assert out[10]["lm_avg_cost_mnats"] == (c_bos_a + c_a_q) // 2
    assert out[11]["lm_avg_cost_mnats"] == (c_bos_q + c_q_z) // 2


def test_curate_ingest_lm_gate(spark, tmp_path):
    """The gate's optional perplexity cap: with lm_max_cost_mnats set,
    a classifier-passing document whose transitions are alien to the
    corpus LM is rejected (lm_ok False), while corpus-typical text is
    admitted; without the cap the schema carries no lm columns."""
    from pqstream_spark.sources.tables import load_table
    from pqstream_spark.streaming.stateful import curate_ingest

    corpus = load_table(spark, SF, "documents").selectExpr("doc_id", "text")
    # both docs pass the classifier head (long, alpha-rich, stopword-
    # bearing); doc 1 walks corpus bigrams (measured ~3.53e6 mnats,
    # zero band collisions), doc 2's transitions are out-of-corpus
    # (measured ~4.12e6) — the cap sits in the gap
    typical = "the a small stream big join data line the batch value merge " * 30
    alien = "the zzq vvk wjx qqp " * 40
    incoming = spark.createDataFrame(
        [(1, "en", typical), (2, "en", alien)],
        "doc_id LONG, lang STRING, text STRING",
    )
    inc_dir = str(tmp_path / "lm_gate_in")
    incoming.coalesce(1).write.mode("overwrite").parquet(inc_dir)

    got: dict = {}

    def emit(df, epoch):
        got.setdefault("rows", []).extend(df.collect())

    from tests.test_streaming import drain

    stream = spark.readStream.schema(incoming.schema).parquet(inc_dir)
    q = curate_ingest(stream, corpus, emit, lm_max_cost_mnats=3_800_000)
    drain(q)
    rows = {r["doc_id"]: r for r in got["rows"]}
    assert rows[1]["clf_keep"] and rows[2]["clf_keep"], (
        "both must pass the classifier so the LM cap is the deciding gate"
    )
    assert rows[1]["lm_ok"] and rows[1]["admitted"]
    assert not rows[2]["lm_ok"] and not rows[2]["admitted"]
    assert rows[2]["lm_avg_cost_mnats"] > rows[1]["lm_avg_cost_mnats"]


def test_corpus_lm_save_load_round_trip(spark, tmp_path):
    """save_corpus_lm → load_corpus_lm preserves tables, order and
    vocab exactly; scoring through the disk round trip is
    value-identical to scoring the in-memory tables; a non-artifact
    directory and a wrong-columns artifact are rejected loudly."""
    import pytest as _pytest

    from pqstream_spark.queries.llm import (
        corpus_lm_tables,
        load_corpus_lm,
        save_corpus_lm,
        score_against_corpus_lm,
    )
    from pqstream_spark.sources.tables import load_table

    corpus = load_table(spark, SF, "documents").selectExpr("doc_id", "text")
    bgc, uni, vsz = corpus_lm_tables(corpus, n=3)
    lm_dir = str(tmp_path / "lm3")
    save_corpus_lm(lm_dir, bgc, uni, vsz, n=3)
    bgc2, uni2, vsz2, n2 = load_corpus_lm(spark, lm_dir)
    assert (vsz2, n2) == (vsz, 3)
    assert sorted(map(tuple, bgc.collect())) == sorted(map(tuple, bgc2.collect()))
    assert sorted(map(tuple, uni.collect())) == sorted(map(tuple, uni2.collect()))

    mem = {r["doc_id"]: (r["lm_bigrams"], r["lm_avg_cost_mnats"])
           for r in score_against_corpus_lm(corpus, bgc, uni, vsz, n=3).collect()}
    dsk = {r["doc_id"]: (r["lm_bigrams"], r["lm_avg_cost_mnats"])
           for r in score_against_corpus_lm(corpus, bgc2, uni2, vsz2, n=n2).collect()}
    assert mem == dsk

    with _pytest.raises(ValueError, match="meta.json"):
        load_corpus_lm(spark, str(tmp_path))  # no artifact here


def test_curate_ingest_lm_gate_from_disk(spark, tmp_path):
    """Round-8 ask #4, gate half: curate_ingest(lm_tables_dir=...)
    scores against the PERSISTED reference LM — same admit/reject
    verdicts as the trained-at-setup gate, no retraining."""
    from pqstream_spark.queries.llm import corpus_lm_tables, save_corpus_lm
    from pqstream_spark.sources.tables import load_table
    from pqstream_spark.streaming.stateful import curate_ingest

    corpus = load_table(spark, SF, "documents").selectExpr("doc_id", "text")
    lm_dir = str(tmp_path / "lm")
    bgc, uni, vsz = corpus_lm_tables(corpus)
    save_corpus_lm(lm_dir, bgc, uni, vsz, n=2)

    typical = "the a small stream big join data line the batch value merge " * 30
    alien = "the zzq vvk wjx qqp " * 40
    incoming = spark.createDataFrame(
        [(1, "en", typical), (2, "en", alien)],
        "doc_id LONG, lang STRING, text STRING",
    )
    inc_dir = str(tmp_path / "in")
    incoming.coalesce(1).write.mode("overwrite").parquet(inc_dir)
    got: dict = {}

    def emit(df, epoch):
        got.setdefault("rows", []).extend(df.collect())

    from tests.test_streaming import drain

    stream = spark.readStream.schema(incoming.schema).parquet(inc_dir)
    q = curate_ingest(stream, corpus, emit, lm_max_cost_mnats=3_800_000,
                      lm_tables_dir=lm_dir)
    drain(q)
    rows = {r["doc_id"]: r for r in got["rows"]}
    assert rows[1]["lm_ok"] and rows[1]["admitted"]
    assert not rows[2]["lm_ok"] and not rows[2]["admitted"]


def test_lm_gate_form_stays_narrow(spark):
    """The lm=False form (streaming ingest gate) must not emit LM
    columns and must not reference the lm relations."""
    from pqstream_spark.queries.llm import _annotations_sql

    sql = _annotations_sql(True, lm=False)
    assert "lm_ppl" not in sql and "lmexc" not in sql
    register_views(spark, SF)
    cols = spark.sql(sql).columns
    assert "lm_ppl" not in cols and "simhash" in cols


def test_lm_randomized_differential_vs_python(spark):
    """Differential pin (the randomized-BPE-equivalence discipline):
    for seeded random corpora, a from-scratch pure-Python bigram-LM
    replica (counts, Laplace micro-nat costs, integer floor-division)
    must reproduce the engine's lm columns exactly — catching any
    drift in tokenization, BOS handling, count definitions, or the
    rounding discipline."""
    import random
    from collections import Counter

    from pqstream_spark.queries.llm import (
        corpus_lm_tables,
        score_against_corpus_lm,
    )

    for seed in (7, 23):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]
        rows = [
            (i, " ".join(rng.choices(vocab, k=rng.randint(0, 9))))
            for i in range(40)
        ]

        toks = {d: t.split() for d, t in rows}
        uni = Counter(w for ws in toks.values() for w in ws)
        nonempty = [d for d, ws in toks.items() if ws]
        uni["<s>"] = len(nonempty)
        bigs = {
            d: list(zip(["<s>"] + toks[d][:-1], toks[d])) for d in nonempty
        }
        bgc = Counter(b for bs in bigs.values() for b in bs)
        v = len(uni) - 1  # vocab excludes BOS

        def cost(b):
            return round(
                (math.log(uni[b[0]] + v) - math.log(bgc[b] + 1)) * 1_000_000
            )

        want = {}
        for d, _ in rows:
            if d in bigs:
                total = sum(cost(b) for b in bigs[d])
                n = len(bigs[d])
                want[d] = (n, total // n)
            else:
                want[d] = (0, None)

        docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        tb, tu, tv = corpus_lm_tables(docs)
        assert tv == v, (seed, tv, v)
        got = {
            r["doc_id"]: (r["lm_bigrams"], r["lm_avg_cost_mnats"])
            for r in score_against_corpus_lm(docs, tb, tu, tv).collect()
        }
        assert got == want, (seed, {
            d: (got[d], want[d]) for d in got if got[d] != want[d]
        })


def test_lm_trigram_differential_vs_python(spark):
    """Order generalization (n=3): the padded-stream formulation must
    match a pure-Python trigram replica — 2×BOS padding, context =
    previous two tokens, prefix counts = all padded bigram
    occurrences, unseen contexts/grams zero-coalesced."""
    import random
    from collections import Counter

    from pqstream_spark.queries.llm import (
        corpus_lm_tables,
        score_against_corpus_lm,
    )

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(9)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(0, 7))))
        for i in range(30)
    ]
    # plus out-of-corpus docs scored against the same tables
    score_rows = rows + [(100, "w0 w1 zz w2"), (101, ""), (102, "solo")]

    def padded(ws):
        return ["<s>", "<s>"] + ws

    toks = {d: t.split() for d, t in rows}
    grams = Counter()
    prefixes = Counter()
    for ws in toks.values():
        if not ws:
            continue
        p = padded(ws)
        for i in range(2, len(p)):
            grams[tuple(p[i - 2:i + 1])] += 1
        for i in range(1, len(p)):
            prefixes[tuple(p[i - 1:i + 1])] += 1
    v = len({w for ws in toks.values() for w in ws})

    want = {}
    for d, t in score_rows:
        ws = t.split()
        if not ws:
            want[d] = (0, None)
            continue
        p = padded(ws)
        total, cnt = 0, 0
        for i in range(2, len(p)):
            g = tuple(p[i - 2:i + 1])
            pre = tuple(p[i - 2:i])
            total += round(
                (math.log(prefixes.get(pre, 0) + v)
                 - math.log(grams.get(g, 0) + 1)) * 1_000_000
            )
            cnt += 1
        want[d] = (cnt, total // cnt)

    corpus = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    tb, tu, tv = corpus_lm_tables(corpus, n=3)
    assert tv == v
    sdocs = spark.createDataFrame(score_rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["lm_bigrams"], r["lm_avg_cost_mnats"])
        for r in score_against_corpus_lm(sdocs, tb, tu, tv, n=3).collect()
    }
    assert got == want, {d: (got[d], want[d]) for d in got if got[d] != want[d]}
