"""Real BPE (Sennrich et al. 2016): deterministic training on the
classic worked example, greedy lowest-rank application, and the
Arrow-batched counting path over the corpus."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_bpe_classic_example():
    """The canonical BPE walkthrough: corpus of {low, lower, newest,
    widest} weighted as in the paper — 'es' then 'est' then 'est</w>'
    emerge among the first merges, and frequent words collapse toward
    single tokens."""
    from pqstream_spark.functions.bpe import bpe_segment, train_bpe

    corpus = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    merges = train_bpe([" ".join(corpus)], n_merges=10)
    assert ("e", "s") in merges[:3]
    es = merges.index(("e", "s"))
    est = merges.index(("es", "t"))
    assert es < est, "merges build on earlier merges in order"
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    seg = bpe_segment("newest", ranks)
    assert len(seg) <= 3, seg  # 'newest' is frequent -> few subwords
    # unseen word falls back to smaller units but never crashes
    assert bpe_segment("zzz", ranks) == ["z", "z", "z", "</w>"]


def test_bpe_training_deterministic(spark):
    from pqstream_spark.functions.bpe import train_bpe_from
    from pqstream_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").selectExpr(
        "doc_id", "text"
    )
    m1 = train_bpe_from(docs, n_merges=100)
    m2 = train_bpe_from(docs, n_merges=100)
    assert m1 == m2 and len(m1) == 100
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in m1)


def test_bpe_counts_over_corpus(spark):
    """The distributed counting path: token counts are bounded by
    chars+words (every subword shrinks a word toward one token) and
    more merges never increase the count."""
    from pqstream_spark.functions.bpe import bpe_token_counts, train_bpe_from
    from pqstream_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").selectExpr(
        "doc_id", "text"
    ).where("doc_id < 100")
    m_small = train_bpe_from(docs, n_merges=20)
    m_big = train_bpe_from(docs, n_merges=200)
    small = {r["doc_id"]: r for r in bpe_token_counts(docs, m_small).collect()}
    big = {r["doc_id"]: r for r in bpe_token_counts(docs, m_big).collect()}
    assert len(small) == 100
    for d, r in small.items():
        # with the end-of-word marker, a word is at least 1 token and
        # at most chars+1 tokens
        assert r["n_words"] <= r["n_bpe_tokens"] <= r["n_chars"] + r["n_words"] + 1
        assert big[d]["n_bpe_tokens"] <= r["n_bpe_tokens"], (
            "more merges can only compress further"
        )


def test_merges_file_round_trip(tmp_path, spark):
    """Round-6 ask #6: a fixture merges file in the public merges.txt
    format segments identically to the in-memory trained table, and
    `curate --bpe --merges FILE` consumes it."""
    import io
    import json

    from pqstream_spark.functions.bpe import (
        FROZEN_MERGES,
        bpe_segment,
        load_merges,
        save_merges,
    )

    path = str(tmp_path / "merges.txt")
    save_merges(path, FROZEN_MERGES)
    loaded = load_merges(path)
    assert loaded == [tuple(m) for m in FROZEN_MERGES]
    r1 = {tuple(m): i for i, m in enumerate(FROZEN_MERGES)}
    r2 = {tuple(m): i for i, m in enumerate(loaded)}
    for text in ("the quick brown fox", "streams of tokens merge",
                 "lowest newest", ""):
        assert bpe_segment(text, r1) == bpe_segment(text, r2)

    # CLI: --merges skips training and uses the released table
    from pqstream_spark.curate import main

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog %d" % i)
         for i in range(30)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    out_dir = str(tmp_path / "out")
    buf = io.StringIO()
    assert main(["--documents", src, "--out", out_dir, "--bpe",
                 "--merges", path, "--cpus", "4"], out=buf) == 0
    stats = json.loads(buf.getvalue())
    assert stats["docs"] == 30
    audit = spark.read.parquet(f"{out_dir}/audit")
    assert audit.where("n_bpe_tokens IS NULL").count() == 0
    # no trained table was written: the released one was used
    import os

    assert not os.path.exists(os.path.join(out_dir, "bpe_merges.json"))


def test_byte_level_table_detection_and_segmentation():
    """A GPT-2-style byte-level table (Ġ space marker, cased symbols)
    auto-detects and segments through bytes_to_unicode + the GPT-2
    pre-tokenizer; the worked example is computed by hand."""
    from pqstream_spark.functions.bpe import (
        bpe_segment_bytes,
        is_byte_level,
        bytes_to_unicode,
    )

    b2u = bytes_to_unicode()
    assert b2u[ord(" ")] == "Ġ"  # the 'Ġ' space stand-in
    assert b2u[ord("A")] == "A"

    merges = [("t", "h"), ("th", "e"), ("Ġ", "c"),
              ("Ġc", "a"), ("Ġca", "t")]
    assert is_byte_level(merges)
    ranks = {m: i for i, m in enumerate(merges)}
    # "the cat": pieces ['the', ' cat'] → 'the' merges fully;
    # ' cat' maps to Ġ,c,a,t → Ġc → Ġca → Ġcat
    assert bpe_segment_bytes("the cat", ranks) == ["the", "Ġcat"]
    # unmerged piece stays as byte stand-ins
    assert bpe_segment_bytes("xy", ranks) == ["x", "y"]

    from pqstream_spark.functions.bpe import END, FROZEN_MERGES

    assert not is_byte_level(FROZEN_MERGES)
    assert any(END in a or END in b for a, b in FROZEN_MERGES)


def test_byte_level_counts_in_spark(spark):
    """bpe_token_counts auto-routes a byte-level table through the
    byte segmenter inside the Arrow batch."""
    from pqstream_spark.functions.bpe import bpe_token_counts

    # space-prefixed merges first, as in real released tables (the
    # space-glued forms dominate training corpora)
    merges = [("Ġ", "t"), ("Ġt", "h"), ("Ġth", "e"), ("t", "h"),
              ("th", "e")]
    docs = spark.createDataFrame(
        [(1, "the the the"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_token_counts(docs, merges).collect()}
    # 'the' → th+e → the = 1 token; ' the' ×2 → Ġt+h,e → … → Ġthe = 1
    assert rows[1] == 3 and rows[2] == 0 and rows[3] == 0


def test_pack_by_bpe(spark, tmp_path):
    """--bpe --pack-by-bpe: pack_bin_bpe mirrors the oracle-certified
    packing rule (per (split, shard), doc_id order, budget cut on the
    running total before the doc) with REAL BPE counts as the
    measure."""
    import io
    import json
    import math

    from pqstream_spark.curate import main
    from pqstream_spark.queries.llm import PACK_BUDGET
    from pqstream_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .selectExpr("doc_id", "lang", "text")
    src = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    out_dir = str(tmp_path / "out")
    buf = io.StringIO()
    assert main(["--documents", src, "--out", out_dir, "--bpe",
                 "--pack-by-bpe", "--cpus", "4"], out=buf) == 0
    assert json.loads(buf.getvalue())["docs"] == 500

    audit = spark.read.parquet(f"{out_dir}/audit")
    rows = audit.where("kept").select(
        "doc_id", "split", "pack_shard", "n_bpe_tokens", "pack_bin_bpe"
    ).collect()
    groups = {}
    for r in rows:
        groups.setdefault((r["split"], r["pack_shard"]), []).append(r)
    checked = 0
    for grp in groups.values():
        cum = 0
        for r in sorted(grp, key=lambda r: r["doc_id"]):
            want = math.floor(cum / PACK_BUDGET)
            assert r["pack_bin_bpe"] == want, (r, want, cum)
            cum += r["n_bpe_tokens"]
            checked += 1
    assert checked > 100
    # non-kept docs carry no bin
    assert audit.where("NOT kept AND pack_bin_bpe IS NOT NULL").count() == 0


def test_sql_chain_equivalence_randomized(spark):
    """Property check for the certified replace-chain: for TRAINED
    tables (whose merges always build on earlier ones — the invariant
    the sequential formulation needs) over randomized corpora, the
    SQL chain counts exactly what the priority segmenter counts, on
    strings with adversarial repetition."""
    import random

    from pqstream_spark.functions.bpe import (
        bpe_count_sql,
        bpe_segment,
        train_bpe,
    )

    rng = random.Random(4242)
    alphabet = "abcdef"

    def word():
        return "".join(rng.choice(alphabet)
                       for _ in range(rng.randint(1, 6)))

    for trial in range(4):
        corpus = [" ".join(word() for _ in range(30)) for _ in range(8)]
        merges = train_bpe(corpus, n_merges=25)
        ranks = {tuple(m): i for i, m in enumerate(merges)}
        cases = [" ".join(word() for _ in range(rng.randint(0, 12)))
                 for _ in range(20)]
        cases += ["aaaaa bbbbb ababab", corpus[0]]
        df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cases)],
            "doc_id long, text string")
        view = f"_bpe_rand_{trial}"
        df.createOrReplaceTempView(view)
        got = {r["doc_id"]: r["n"] for r in spark.sql(
            f"SELECT doc_id, {bpe_count_sql(merges, True)} AS n "
            f"FROM {view}").collect()}
        for i, c in enumerate(cases):
            assert got[i] == len(bpe_segment(c, ranks)), (trial, c)
        spark.catalog.dropTempView(view)
