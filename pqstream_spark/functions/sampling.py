"""THE deterministic hash-sample idiom, defined once.

Every sample-trained artifact in this engine (IVF codebook, PQ
sub-codebooks, BPE merges) selects its training rows with the same
RNG-free multiplicative-hash predicate. One definition keeps the
trainers in lockstep and fixes, in one place, two subtleties the
inline copies had:

- ANSI overflow: Spark 4 runs ANSI mode by default, and
  `id * 1103515245` throws ARITHMETIC_OVERFLOW for |id| > ~8.4e9 —
  exactly the xxhash64-derived doc_ids curate.py produces. The
  predicate reduces the id modulo 8191 BEFORE the multiply
  ((id·a + b) mod m ≡ ((id mod m)·a + b) mod m), so the intermediate
  stays < 2^43.
- sign: a signed `%` yields negatives for negative ids, which made
  `< threshold` admit ~62% of a hashed-id corpus instead of ~25%.
  pmod (and the matching Python key) keeps the residue in [0, m).

For the SMALL NON-NEGATIVE ids of the driver testdata the values are
bit-identical to the original formulation, so every DuckDB-oracle
expectation is unchanged.
"""

from __future__ import annotations

A, B, M = 1103515245, 12345, 8191
DEFAULT_THRESHOLD = 2048  # ~1/4 of rows; tighten for huge corpora


def sample_pred(id_col: str, spark: bool = True,
                threshold: int = DEFAULT_THRESHOLD) -> str:
    """SQL predicate admitting ~threshold/M of rows, overflow- and
    sign-safe, identical semantics in both dialects."""
    if spark:
        return f"pmod(pmod({id_col}, {M}) * {A} + {B}, {M}) < {threshold}"
    # DuckDB has no pmod: normalize the inner residue by hand; the
    # outer operand is then non-negative, so plain % suffices
    return (f"((({id_col} % {M} + {M}) % {M}) * {A} + {B}) % {M}"
            f" < {threshold}")


def sample_order_expr(id_col: str, spark: bool = True) -> str:
    """The matching ORDER BY key (same hash value the predicate
    tested), for deterministic seed selection inside the sample."""
    if spark:
        return f"pmod(pmod({id_col}, {M}) * {A} + {B}, {M})"
    return f"((({id_col} % {M} + {M}) % {M}) * {A} + {B}) % {M}"


def sample_key(i: int) -> int:
    """Python twin of sample_order_expr — Python's % on a positive
    modulus is already pmod."""
    return ((i % M) * A + B) % M


def capped_sample_df(df, id_col: str, cap: int):
    """Distributed deterministic cap: ORDER BY the sample hash (then
    id) LIMIT cap. Spark plans this as TakeOrderedAndProject — each
    partition keeps its top-`cap` rows and the driver merges cap-sized
    heads — so the driver never holds more than `cap` rows no matter
    how many the hash predicate admits (at 100 TB the predicate alone
    is NOT a bound; this is). Selects exactly the rows `sort_and_cap`
    picks, because the sort key is the same (hash, id) pair — keep
    `sort_and_cap` on the collected rows as a cheap cross-check."""
    from pyspark.sql import functions as F

    return df.orderBy(
        F.expr(sample_order_expr(id_col)), F.col(id_col)
    ).limit(cap)


def sort_and_cap(rows, id_field: str, cap: int):
    """Deterministic driver-side ordering + cap for collected sample
    rows: sort by the SAME hash the predicate tested (then id), THEN
    truncate — membership above the cap is a pure function of the
    data, never of partition arrival order."""
    rows = sorted(rows, key=lambda r: (sample_key(r[id_field]), r[id_field]))
    return rows[:cap]
