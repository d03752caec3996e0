"""Portable hashing / tokenization column expressions.

Everything here is a pure JVM-side Spark SQL expression (whole-stage
codegen, no Python in the hot path) chosen to be *reproducible in ANSI
SQL engines*: tokenization is ``regexp_extract_all`` on ``[a-z0-9]+``,
hashes are md5 (identical hex output everywhere), and hex->int uses the
first 8 md5 hex chars (fits int64). That portability is what lets the
driver's DuckDB oracle confirm MinHash/SimHash pipelines value-for-value
instead of rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TOKEN_PATTERN = "([a-z0-9]+)"


def tokens(col) -> Column:
    """lowercase [a-z0-9]+ token array (matches analyzer 'simple')."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), F.lit(1))


def shingles(toks_col_name: str, n: int = 3) -> Column:
    """Distinct n-gram token shingles (space-joined) of an array column.

    ``transform(sequence(...))`` stays inside codegen; docs shorter than
    n tokens yield an empty array. Takes the *column name* of a token
    array so the generated SQL is also usable verbatim in the oracle.

    The token array binds to the OUTER lambda variable ``arr`` (via the
    single-element ``transform(array(t), arr -> ...)`` wrapper) instead
    of being referenced by name inside the inner lambda: CollapseProject
    inlines a referenced tokens *column* (a regexp_extract_all chain)
    into every element access, re-running the regex ~n*size times per
    row — measured 27ms/doc, the MinHash bottleneck at 400k pages. A
    lambda variable cannot be inlined, so the tokens evaluate once.
    """
    t = toks_col_name
    parts = ", ".join([f"arr[i - 1 + {j}]" for j in range(n)])
    return F.array_distinct(
        F.expr(
            f"flatten(transform(array({t}), arr -> "
            f"transform(sequence(1, greatest(size(arr) - {n - 1}, 0)), "
            f"i -> concat_ws(' ', {parts}))))"
        )
    )


def band_key(minhash_cols: list[Column]) -> Column:
    """LSH band key: md5 of the concatenated member min-hashes."""
    return F.md5(F.concat_ws("|", *minhash_cols))
