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
