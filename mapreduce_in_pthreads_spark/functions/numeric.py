"""Order-stable numeric aggregates.

Double summation is order-dependent (a+b+c != c+a+b in IEEE754), and
Spark's shuffle order differs run-to-run and from DuckDB's scan order.
For oracle-comparable results we route double sums through an EXACT
fixed-point path: each input is rounded once at 4 dp (deterministic per
value, identical to a ``decimal(25,4)`` cast), then summed with exact
integer arithmetic — associative, so partition order can't change the
result — and converted back to double at the end.

Implementation (optimization round 10): the original formulation summed
``decimal(25,4)`` values directly. Decimal aggregation buffers above
precision 18 leave Spark's compact-long representation and pay a
BigDecimal allocation + add per row — measured 2.1 s vs 0.7 s for the
equivalent long sums on q1_pricing_summary at sf0.1 (guide §2.3
"narrower types"). The sums now run on LONGS: the 4-dp value is scaled
to an unscaled integer ``u`` and split into ``hi = u >> 22`` and
``lo = u & (2^22-1)`` (two's-complement identity: u = (u>>22)*2^22 +
(u&mask), exact for negatives too), each summed as a plain long — pure
WholeStageCodegen integer work. The total is recombined ONCE per group
in decimal(38,0) (Σu = 2^22·Σhi + Σlo), rescaled exactly, and cast to
double.

Bit-equivalence to the decimal formulation (the DuckDB oracle twin is
UNCHANGED):
- ``round(x, 4)`` and ``cast(x as decimal(25,4))`` both round the
  shortest decimal repr of the double HALF_UP at 4 dp (Spark's Round
  and Cast both go through ``BigDecimal.valueOf``), so the unscaled
  integer is identical;
- the second ``round(y*10000)`` recovers that integer exactly: y*1e4
  is within N·2^-51 < 0.5 of the integer N for |x| ≤ ~5e10;
- Σu is exact (no rounding anywhere), and decimal→double conversion of
  the same rational value is correctly rounded on both paths.

Overflow headroom (the reason for the hi/lo split instead of a bare
``sum(long)``): |Σlo| < n·2^22 and |Σhi| ≤ n·max|u|/2^22, so with
4-dp money magnitudes (|u| ≤ ~1e12) both partial sums stay inside
int64 past 10^12 rows — comfortably beyond 100 TB fact tables, where a
bare long sum of unscaled 4-dp money WOULD overflow (≈9.2e14 dollars).
Verified bit-identical against the decimal formulation on every
affected registry query at sf0.001/0.01/0.1 (tests + oracle sweep).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,4)"
# DuckDB twin of the same construct; keep in sync with DEC.
SQL_DEC = "DECIMAL(25,4)"

# hi/lo split point for exact long-based sums (see module docstring).
SPLIT_BITS = 22
SPLIT = 1 << SPLIT_BITS
_MASK = SPLIT - 1


def scaled_long(col: Column | str, dp: int = 4) -> Column:
    """Unscaled-integer (long) view of a double rounded HALF_UP at
    ``dp`` decimal places — bit-equivalent to the unscaled value of
    ``cast(x as decimal(25,dp))`` for |x| ≤ ~5e10 (see module
    docstring for the two-step rounding argument)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.round(c, dp) * (10 ** dp)).cast("long")


def split_sum(u: Column, scale_den: int = 1) -> Column:
    """Exact sum of a long column via hi/lo split long sums, recombined
    once per group in decimal(38,0) and divided (exactly) by
    ``scale_den``. Returns the decimal total; callers cast as needed.
    Two aggregate functions per call — both plain long sums, map-side
    combinable, pure codegen."""
    hi = F.shiftright(u, SPLIT_BITS)
    lo = u.bitwiseAND(F.lit(_MASK))
    tot = (F.sum(hi).cast("decimal(38,0)") * F.lit(SPLIT)
           + F.sum(lo).cast("decimal(38,0)"))
    if scale_den == 1:
        return tot
    return tot / F.lit(scale_den)


_MASK21 = (1 << 21) - 1


def split_sum_wide(u: Column, scale_den: int = 1) -> Column:
    """Exact sum of a long column whose per-row magnitude can reach
    ~2^62 (squared 4-dp moments: (1e9)² ≈ 2^60) — a 3-way split at
    bits 42/21, so every partial sum stays inside int64 past 10^12
    rows. Same recombination/exactness contract as split_sum; three
    long sums per call.

    Division exactness (r11, ADVICE r10): ``decimal(38,0)/10^8`` has
    its result scale capped at 6 by Spark's precision-loss rule
    (38 integer digits leave no room), HALF_UP-rounding an 8-dp
    quotient — exact for ≤2-dp inputs (u a multiple of 100) but
    silently divergent at 3-4 dp. Casting the recombined total to
    decimal(30,0) first makes the quotient decimal(38,8) — exact for
    any 4-dp input — at the cost of stating the total's headroom
    honestly as <10^30 (= 10^12 rows × (1e5 money · 1e4 scaling)²;
    beyond it the cast yields NULL rather than a silently-rounded
    value). Pinned by the adversarial 4-dp test in
    tests/test_r11_optimizations.py."""
    hi = F.shiftright(u, 42)
    mid = F.shiftright(u, 21).bitwiseAND(F.lit(_MASK21))
    lo = u.bitwiseAND(F.lit(_MASK21))
    tot = (F.sum(hi).cast("decimal(38,0)") * F.lit(1 << 42)
           + F.sum(mid).cast("decimal(38,0)") * F.lit(1 << 21)
           + F.sum(lo).cast("decimal(38,0)"))
    if scale_den == 1:
        return tot
    return tot.cast("decimal(30,0)") / F.lit(scale_den)


def split_sum_over(u: Column, w, scale_den: int = 1) -> Column:
    """Window twin of split_sum: exact per-frame sum of a long column
    via two long window sums over the same frame, recombined per row.
    The two sums share the window spec, so Catalyst plans ONE Window
    operator — no extra exchange or sort."""
    hi = F.shiftright(u, SPLIT_BITS)
    lo = u.bitwiseAND(F.lit(_MASK))
    tot = (F.sum(hi).over(w).cast("decimal(38,0)") * F.lit(SPLIT)
           + F.sum(lo).over(w).cast("decimal(38,0)"))
    if scale_den == 1:
        return tot
    return tot / F.lit(scale_den)


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive sum of a double column. Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(25,4))) AS DOUBLE) AS alias``."""
    c = F.col(col) if isinstance(col, str) else col
    return split_sum(scaled_long(c), 10 ** 4).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-insensitive mean: exact fixed-point sum divided by count,
    in double. Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(25,4))) AS DOUBLE) / COUNT(x) AS alias``."""
    c = F.col(col) if isinstance(col, str) else col
    return (split_sum(scaled_long(c), 10 ** 4).cast("double")
            / F.count(c)).alias(alias)


def money_scaled(col: Column | str) -> Column:
    """Cents (long) view of a 2-dp monetary double column —
    bit-equivalent to the unscaled value of ``cast(x as decimal(12,2))``
    for genuinely 2-dp data (the only data ``money`` was ever applied
    to): the stored double is within ~1e-9 of k/100, so round(x*100)
    recovers k exactly, and the decimal cast's shortest-repr HALF_UP
    setScale(2) yields the same k."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def disc_rev_u() -> Column:
    """Unscaled (1e-4 dollars) long view of the TPC-H revenue term
    l_extendedprice * (1 - l_discount) — the exact (16,4) decimal
    product money(p) * (1.00 - rate(d)) as cents · (100 - bp).
    Sum with ``msum(..., dp=4)``."""
    return money_scaled("l_extendedprice") * (100 - money_scaled("l_discount"))


def msum(u: Column, alias: str, dp: int = 4) -> Column:
    """Exact double sum of an unscaled long money expression at ``dp``
    decimal places (see split_sum). Oracle twin: the decimal product
    sum it replaced — e.g. ``CAST(SUM(money * (1 - rate)) AS DOUBLE)``
    for ``msum(disc_rev_u(), a, 4)``."""
    return split_sum(u, 10 ** dp).cast("double").alias(alias)


MONEY = "decimal(12,2)"
RATE = "decimal(4,2)"


def money(col: Column | str) -> Column:
    """Exact decimal view of a 2-dp monetary double column. The source
    data carries exactly 2 decimal digits, so this cast is EXACT in
    both Spark and DuckDB (no tie-rounding) — products/sums built on it
    are bit-identical across engines. Products of doubles cast to
    decimal are NOT safe: Spark rounds the shortest string repr
    (HALF_UP) while DuckDB rounds the binary value, and they disagree
    on x.xxxx5 ties."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def rate(col: Column | str) -> Column:
    """Exact decimal view of a 2-dp ratio column (discount/tax)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(RATE)


def one() -> Column:
    """Decimal literal 1.00 — a function because Column construction
    needs an active SparkContext (import-time lit() would fail)."""
    return F.lit(1).cast("decimal(3,2)")


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE)"
            f" / COUNT({expr}) AS {alias}")
