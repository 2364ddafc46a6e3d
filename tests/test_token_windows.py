"""Empty-safety of the shared sliding-window token expressions
(``functions/tokens.py``) — the r5 ADVICE item: the old
``F.sequence(1, n-1)`` construct produced a DESCENDING ``[1, 0]`` on
sub-window-size inputs (Spark defaults the step to -1), fabricating
windows the DuckDB oracles never emit. The helpers must return ``[]``
below the window size and the exact classic windows at or above it.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_in_pthreads_spark.functions.tokens import (
    adjacent_bigrams, adjacent_pairs, sliding_ngrams)

CASES = [
    [],                          # degenerate: no tokens
    ["solo"],                    # 1 token — the sequence(1,0) trap
    ["a", "b"],
    ["a", "b", "c"],
    ["w1", "w2", "w3", "w4", "w5"],
]


def _run(spark, col):
    df = spark.createDataFrame([(c,) for c in CASES],
                               "toks array<string>")
    return [r.out for r in
            df.select(col(F.col("toks")).alias("out")).collect()]


def test_adjacent_bigrams_empty_safe(spark):
    got = _run(spark, adjacent_bigrams)
    want = [[" ".join(t[i:i + 2]) for i in range(len(t) - 1)]
            for t in CASES]
    assert got == want
    assert got[0] == [] and got[1] == []


def test_adjacent_pairs_empty_safe(spark):
    got = _run(spark, lambda c: adjacent_pairs(c, "src", "dst"))
    want = [[(t[i], t[i + 1]) for i in range(len(t) - 1)]
            for t in CASES]
    assert [[tuple(p) for p in row] for row in got] == want


@pytest.mark.parametrize("n", [2, 3, 5, 7])
def test_sliding_ngrams_empty_safe(spark, n):
    got = _run(spark, lambda c: sliding_ngrams(c, n))
    want = [[" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]
            for t in CASES]
    assert got == want
