"""PII detection and scrubbing for training-data curation — the
redaction pass every production corpus pipeline runs before text
reaches a training job (the curation-side sibling of the CDC engine's
field redaction, operators/redact.py, which redacts by COLUMN NAME;
here the data itself is searched).

Patterns are deliberately conservative and ENGINE-PORTABLE: Java
regex (Spark) and RE2 (DuckDB) agree on them (no lookarounds — RE2
has none; `[0-9]` instead of `\\d`; ASCII `\\b` word boundaries, which
both support). That portability is what lets `text_annotations` carry
an oracle-certified `n_pii_hits` column: the pattern semantics are
re-checked against DuckDB every round, not just unit-tested.

Scrubbing replaces each match with a typed placeholder (`<EMAIL>`,
`<PHONE>`, `<IP>`, `<SSN>`) — placeholders keep the token stream
aligned for dedup/fingerprinting while removing the identifier, the
standard trade. Order matters: email first (an address would
otherwise leave its digits for the naive phone pattern), then ssn
before phone (both are digit runs with dashes).

The patterns are intentionally high-precision/naive-recall (e.g. the
IPv4 pattern accepts 999.999.999.999): a production deployment swaps
in its own pattern set via `scrub_pii_expr(patterns=...)`; the
engine contract — counted per row in one narrow codegen'd scan,
scrubbed with chained regexp_replace, zero shuffles — is what this
module fixes.
"""

from __future__ import annotations

# (name, pattern, placeholder) — pattern in RE2-and-Java-compatible
# syntax, single-backslash form (the Spark SQL literal doubles them)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "<PHONE>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
     "<IP>"),
]


def _lit(pat: str, spark: bool) -> str:
    """Pattern as a SQL string literal: Spark processes backslash
    escapes inside literals, DuckDB does not."""
    return pat.replace("\\", "\\\\") if spark else pat


def pii_count_expr(spark: bool = True, text_col: str = "text") -> str:
    """Number of REPLACEMENTS the scrub chain performs on `text_col` —
    one BIGINT per row, identical in both engines. Each pattern is
    counted on the text AFTER the earlier patterns scrubbed it (the
    same order `scrub_pii_expr` applies), so overlapping matches — an
    SSN-shaped digit run inside an email address — are never
    double-counted and curate's `pii_matches_scrubbed` equals the
    number of placeholders actually inserted."""
    parts = []
    cur = text_col
    for _name, pat, ph in PII_PATTERNS:
        if spark:
            parts.append(f"regexp_count({cur}, '{_lit(pat, True)}')")
            cur = f"regexp_replace({cur}, '{_lit(pat, True)}', '{ph}')"
        else:
            parts.append(
                f"len(regexp_extract_all({cur}, '{_lit(pat, False)}'))"
            )
            cur = (f"regexp_replace({cur}, '{_lit(pat, False)}', "
                   f"'{ph}', 'g')")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def scrub_pii_expr(spark: bool = True, text_col: str = "text",
                   patterns: list[tuple[str, str, str]] | None = None) -> str:
    """`text_col` with every PII match replaced by its typed
    placeholder — chained regexp_replace in declaration order (see
    module docstring for why the order matters)."""
    s = text_col
    for _name, pat, ph in (patterns or PII_PATTERNS):
        if spark:
            s = f"regexp_replace({s}, '{_lit(pat, True)}', '{ph}')"
        else:
            s = f"regexp_replace({s}, '{_lit(pat, False)}', '{ph}', 'g')"
    return s
