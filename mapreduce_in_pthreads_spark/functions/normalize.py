"""Token normalization — the executable spec of the reference's map-side
projection pipeline, as pure Catalyst expressions (no UDFs).

Reference pipeline (verified golden-exact over the committed corpus,
SURVEY.md Appendix A): lowercase the line (tolowercase, mapreduce.c:50-54)
→ keep only the leading run of ``[a-z0-9]`` (trimString, mapreduce.c:56-61;
"don't"→"don", "Macbeth."→"macbeth", BOM line → "") → drop the record if
the result is empty (mapreduce.c:112-114), with the line number already
consumed.

Everything here stays inside WholeStageCodegen — ``lower`` and
``regexp_extract`` are JVM-side built-ins, which is what lets the same
pipeline run over 100 TB without a Python round-trip per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LEADING_ALNUM = "^[a-z0-9]*"


def normalize_word(col: Column | str) -> Column:
    """lower → leading [a-z0-9]* run. Empty string means "drop me"
    (the caller filters), mirroring mapreduce.c:110-114."""
    return F.regexp_extract(F.lower(col), LEADING_ALNUM, 0)


def tokenize_with_pos(text_col: str = "text", sep: str = " "):
    """posexplode a separator-delimited text column → (pos, raw) with
    1-based positions assigned BEFORE filtering — the positional
    analogue of the reference's pre-filter linenum (mapreduce.c:109).

    Returns the two exploded columns; use as
    ``df.select("doc_id", *tokenize_with_pos())``.
    """
    return [F.posexplode(F.split(text_col, sep)).alias("pos0", "raw")]
