"""Empty-safe sliding-window expressions over token arrays.

Every n-gram/bigram/edge builder in the engine used to write
``F.transform(F.sequence(lit(1), size(toks) - 1), ...)`` — correct for
documents with >= 2 tokens (this corpus guarantees 10-100), but latent:
on a 0/1-token document Spark's ``sequence(1, 0)`` defaults to step -1
and yields a DESCENDING ``[1, 0]``, so the transform fabricates
nonsense windows (or ``slice`` raises) while the DuckDB oracles'
``range(1, n)`` is simply empty.  These helpers are total: n < window
size yields ``[]``, and for n >= window size they are expression-
identical to the old construct (verified by the oracle contract, which
hash-compares every consumer).

The pattern is the one ``dunning_llr_collocations`` pioneered:
``slice(toks, 1, greatest(n-1, 0))`` zipped against
``slice(toks, 2, greatest(n-1, 0))`` — ``slice`` with length 0 is
empty for ANY start, so the degenerate case never constructs a window.

Scale: pure per-row array expressions; zero shuffle, codegen-friendly,
no UDFs.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def adjacent_pairs(toks: Column, src: str = "src",
                   dst: str = "dst") -> Column:
    """``array<struct<src,dst>>`` of adjacent token pairs; [] if n<2."""
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m),
        lambda a, b: F.struct(a.alias(src), b.alias(dst)))


def adjacent_bigrams(toks: Column, sep: str = " ") -> Column:
    """``array<string>`` of sep-joined adjacent bigrams; [] if n<2."""
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m),
        lambda a, b: F.concat_ws(sep, a, b))


def sliding_ngrams(toks: Column, n: int, sep: str = " ") -> Column:
    """``array<string>`` of sep-joined sliding n-grams; [] if size<n.

    Builds the 1-based start-index list as the first
    ``greatest(size - (n-1), 0)`` entries of ``[1..size]`` (via the
    index-aware ``transform``), so no ``sequence`` call can ever see a
    descending range.
    """
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    starts = F.slice(F.transform(toks, lambda _, i: i + 1), 1, m)
    return F.transform(
        starts, lambda i: F.concat_ws(sep, F.slice(toks, i, n)))
