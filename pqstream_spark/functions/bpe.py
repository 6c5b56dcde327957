"""Byte-pair encoding — Sennrich, Haddow, Birch, "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016 (public
method): train a merge table on a text sample, then segment words into
subword units by applying merges greedily in training order. This is
the REAL algorithm the `bpe_ish_tokens` regex column in
text_annotations approximates. The application loop is merge-table
generic, but this module's pre-tokenizer is a lowercase [a-z0-9]
word splitter — a RELEASED merge table (GPT-2 style, with case,
punctuation and whitespace-marker symbols) additionally needs its own
pre-tokenizer swapped in before its merges line up.

Engine shape: training is driver-side over a bounded hash sample (the
same train-on-a-sample discipline as the IVF/PQ codebooks — a merge
table is a small artifact, deterministic, shippable as JSON);
application is an Arrow-batched mapInPandas with the merge ranks in
the closure — per-doc work, embarrassingly parallel, no shuffle.
Determinism: pair counting uses exact integers and ties break
lexicographically, so the same sample always yields the same merges.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame

from .sampling import capped_sample_df, sample_pred, sort_and_cap

SAMPLE_PRED = sample_pred("doc_id")  # overflow/sign-safe (xxhash64 ids!)
SAMPLE_CAP = 4096  # enforced IN-ENGINE (capped_sample_df) before collect
END = "</w>"


import re as _re

_WORD_RE = _re.compile(r"[a-z0-9]+")


def _words(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


def train_bpe(texts: list[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Classic BPE training: words → char sequences (+ end-of-word
    marker), repeatedly merge the most frequent adjacent symbol pair;
    ties break lexicographically (deterministic). Returns the ordered
    merge table."""
    vocab = Counter()
    for t in texts:
        for w in _words(t):
            vocab[tuple(w) + (END,)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # max count, lexicographic tie-break — fully deterministic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        out: Counter = Counter()
        for sym, n in vocab.items():
            ns, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(sym[i])
                    i += 1
            out[tuple(ns)] += n
        vocab = out
    return merges


def train_bpe_from(docs: DataFrame, n_merges: int = 200) -> list[tuple[str, str]]:
    """Train on a deterministic hash sample of a (doc_id, text) frame.
    The cap is enforced IN-ENGINE (capped_sample_df: a sorted LIMIT →
    distributed TakeOrderedAndProject), so the driver never collects
    more than SAMPLE_CAP rows regardless of corpus size; membership is
    a pure function of the data (hash order), never of partition
    arrival. `sort_and_cap` re-sorts the collected rows as a no-op
    cross-check."""
    rows = sort_and_cap(
        capped_sample_df(
            docs.where(SAMPLE_PRED).select("doc_id", "text"),
            "doc_id", SAMPLE_CAP,
        ).collect(),
        "doc_id", SAMPLE_CAP,
    )
    return train_bpe([r["text"] or "" for r in rows], n_merges=n_merges)


def _segment_word(w: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply the LOWEST-RANK applicable merge until none applies
    (training order = application order, the BPE contract)."""
    sym = list(w) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_segment(text: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    out: list[str] = []
    for w in _words(text):
        out.extend(_segment_word(w, ranks))
    return out


def bpe_token_counts(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(doc_id, text) → (doc_id, n_bpe_tokens, n_words, n_chars) via
    Arrow-batched mapInPandas — the real token-budget column a
    curation pass uses (annotations' bpe_ish_tokens is the regex
    approximation of exactly this)."""
    from collections.abc import Iterator

    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "n_bpe_tokens": [],
                   "n_words": [], "n_chars": []}
            for text in pdf["text"]:
                t = text or ""
                words = _words(t)  # tokenize ONCE per doc (hot path)
                n_toks = sum(len(_segment_word(w, ranks)) for w in words)
                out["n_bpe_tokens"].append(n_toks)
                out["n_words"].append(len(words))
                out["n_chars"].append(len(t))
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        count, "doc_id long, n_bpe_tokens long, n_words long, n_chars long"
    )
