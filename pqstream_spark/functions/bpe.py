"""Byte-pair encoding — Sennrich, Haddow, Birch, "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016 (public
method): train a merge table on a text sample, then segment words into
subword units by applying merges greedily in training order. This is
the REAL algorithm the `bpe_ish_tokens` regex column in
text_annotations approximates. The application loop is merge-table
generic, with TWO pre-tokenizers: trained word-level tables use the
lowercase [a-z0-9] splitter + </w> end marker; RELEASED byte-level
tables (GPT-2 `merges.txt` via `load_merges`, with case, punctuation
and the 'Ġ' whitespace marker) use the public bytes_to_unicode map +
the GPT-2 regex (`bpe_segment_bytes`) — auto-detected per table.

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


# A small self-contained training corpus for the FROZEN merge table —
# the "released vocabulary" the SQL certification column inlines. Being
# in-repo (not derived from the driver's testdata) keeps the table
# stable across testdata regenerations; the classic worked example in
# test_bpe pins its behavior.
_FIXTURE_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a stream of database changes becomes a stream of events",
    "the engine reads the stream and writes the curated corpus",
    "low lower lowest newer newest wider widest",
    "tokens merge into subword units by pair frequency",
    "the most frequent pair of symbols merges first",
    "training data pipelines deduplicate and score documents",
    "each document receives a quality score and a token count",
    "the quick stream of tokens flows through the engine",
    "frequency counts decide which pairs merge next",
]

# trained at import: deterministic (exact-integer counts, lexicographic
# tie-break), fast (tiny corpus), and self-evidently consistent with
# train_bpe — no risk of a stale hardcoded copy drifting from the code
FROZEN_MERGES: list[tuple[str, str]] = train_bpe(_FIXTURE_TEXTS, n_merges=40)



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


def bpe_count_sql(merges: list[tuple[str, str]], spark: bool = True,
                  text_col: str = "text") -> str:
    """SQL (both dialects): total BPE token count of `text_col` under
    `merges` — the certification twin of `bpe_token_counts`, pinned
    equal to the Python segmenter by test.

    Encoding trick: render each word as boundary-safe cells — every
    symbol spelled "|sym " (its own leading '|' and trailing space) —
    then apply the merge table as a chain of plain `replace` calls,
    one per merge in training order: replace('|a |b ', '|ab '). The
    delimiters are PART of each cell, so consecutive matches never
    share a boundary character (the classic ' a b ' encoding loses
    every other match in a run) and a symbol can never match inside a
    neighbor's cell. Applying merges in rank order with replace-all
    is the original Sennrich formulation; the priority-queue
    `_segment_word` is equivalent on tables where no merge enables an
    EARLIER one — true of trained tables (a merge's symbols always
    form before it) unless two different merges concatenate to the
    same string, which the FROZEN_MERGES test corpus pins against.
    Token count = number of '|' cells left standing."""
    if is_byte_level(merges):
        # mirror bpe_token_counts' auto-detection contract: this
        # formulation hardwires the word-level [a-z0-9] pre-tokenizer,
        # so a GPT-2-style byte-level table would silently count
        # tokens that never line up with bpe_segment_bytes
        raise ValueError(
            "bpe_count_sql: byte-level (GPT-2 style) merge table — "
            "this word-level SQL formulation cannot apply it; use "
            "bpe_token_counts, which auto-detects and routes "
            "byte-level tables through bpe_segment_bytes"
        )
    if spark:
        words = f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
        joined = f"array_join({words}, chr(1))"
        chars = f"regexp_replace({joined}, '([a-z0-9])', '|$1 ')"
        size = "size"
    else:
        words = f"regexp_extract_all(lower({text_col}), '[a-z0-9]+')"
        joined = f"array_to_string({words}, chr(1))"
        chars = f"regexp_replace({joined}, '([a-z0-9])', '|\\1 ', 'g')"
        size = "len"
    rendered = (f"CASE WHEN {size}({words}) = 0 THEN '' "
                f"ELSE concat(replace({chars}, chr(1), '|{END} '), "
                f"'|{END} ') END")
    s = rendered
    for a, b in merges:
        s = f"replace({s}, '|{a} |{b} ', '|{a}{b} ')"
    return f"CAST(length({s}) - length(replace({s}, '|', '')) AS BIGINT)"


def _merge_loop(sym: list[str],
                ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply the LOWEST-RANK applicable merge until none applies
    (training order = application order, the BPE contract)."""
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


def _segment_word(w: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    return _merge_loop(list(w) + [END], ranks)


# --- released merge tables (GPT-2 style merges.txt) --------------------------------
# The public format: optional '#version: ...' header, then one
# space-separated symbol pair per line in rank order. Byte-level
# tables (GPT-2, RoBERTa) pre-map UTF-8 bytes through the public
# bytes_to_unicode table (printable stand-ins for all 256 byte
# values; U+0120 'Ġ' is the leading-space byte) and pre-tokenize with
# the GPT-2 regex; word-level tables (this module's trained ones) use
# the [a-z0-9]+ splitter + the </w> end marker. `load_merges`
# auto-detects which pre-tokenizer a table needs.


def save_merges(path: str, merges: list[tuple[str, str]]) -> None:
    """Write the public merges.txt format."""
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


def load_merges(path: str) -> list[tuple[str, str]]:
    """Parse the public merges.txt format: skip '#...' headers and
    blank lines; each remaining line is one 'a b' pair in rank
    order."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(
                    f"load_merges: malformed line {line!r} in {path}"
                )
            merges.append((parts[0], parts[1]))
    return merges


def bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte→printable-unicode table: printable ASCII
    and Latin-1 ranges map to themselves, every other byte value gets
    a stand-in from U+0100 upward (so 0x20 ' ' becomes U+0120 'Ġ')."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_B2U = bytes_to_unicode()

# GPT-2's pre-tokenizer pattern, spelled with stdlib `re` classes:
# \p{L} → [^\W\d_], \p{N} → \d, \p{punct-ish} → [^\s\w]|_ (documented
# deviation: stdlib has no \p{} escapes; '_' is punctuation here as in
# the original's "not letter/number/space" class).
_GPT2_PAT = _re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+"
)


def is_byte_level(merges: list[tuple[str, str]]) -> bool:
    """A table whose symbols use byte stand-ins ('Ġ' et al.) is a
    byte-level (GPT-2 style) table; a table using the </w> end marker
    (or neither — early merges) is word-level."""
    for a, b in merges:
        if "Ġ" in a or "Ġ" in b:
            return True
        if END in a or END in b:
            return False
    return False


def bpe_segment_bytes(text: str,
                      ranks: dict[tuple[str, str], int]) -> list[str]:
    """Byte-level segmentation: GPT-2 pre-tokenizer pieces → UTF-8
    bytes → printable stand-ins → the same lowest-rank merge loop (no
    end-of-word marker; released tables encode boundaries with the
    'Ġ' space prefix instead)."""
    out: list[str] = []
    for piece in _GPT2_PAT.findall(text):
        mapped = [_B2U[b] for b in piece.encode("utf-8")]
        out.extend(_merge_loop(mapped, ranks))
    return out


def bpe_segment(text: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    out: list[str] = []
    for w in _words(text):
        out.extend(_segment_word(w, ranks))
    return out


def bpe_token_counts(
    docs: DataFrame, merges: list[tuple[str, str]],
    byte_level: bool | None = None,
) -> DataFrame:
    """(doc_id, text) → (doc_id, n_bpe_tokens, n_words, n_chars) via
    Arrow-batched mapInPandas — the real token-budget column a
    curation pass uses (annotations' bpe_ish_tokens is the regex
    approximation of exactly this). `byte_level=None` auto-detects
    from the table's symbols: a released GPT-2-style merges.txt gets
    the byte-level pre-tokenizer, a trained word-level table the
    [a-z0-9]+ splitter — the pre-tokenizer MUST match the table or
    its merges never line up (the module docstring's caveat, now
    handled instead of documented)."""
    from collections.abc import Iterator

    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    if byte_level is None:
        byte_level = is_byte_level(merges)

    def count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "n_bpe_tokens": [],
                   "n_words": [], "n_chars": []}
            for text in pdf["text"]:
                t = text or ""
                words = _words(t)  # tokenize ONCE per doc (hot path)
                if byte_level:
                    n_toks = len(bpe_segment_bytes(t, ranks))
                else:
                    n_toks = sum(len(_segment_word(w, ranks))
                                 for w in words)
                out["n_bpe_tokens"].append(n_toks)
                out["n_words"].append(len(words))
                out["n_chars"].append(len(t))
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        count, "doc_id long, n_bpe_tokens long, n_words long, n_chars long"
    )
