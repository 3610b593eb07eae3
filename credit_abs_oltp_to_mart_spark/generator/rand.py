"""Deterministic, distribution-friendly random draws.

The reference seeds `random`/Faker globally (pg_oltp_synth.py:146-148) —
sequential state that cannot survive distributed execution. Here every draw
is a pure function of (seed, salt, key columns) via xxhash64, so output is
identical for a given config regardless of partitioning or cluster size
(SURVEY.md §2.11 determinism note). Parity with the reference is
statistical (same distributions/invariants), not byte-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TWO_53 = 2**53


def unit(seed: int, salt: str, *keys: Column) -> Column:
    """Uniform double in [0, 1), deterministic in (seed, salt, keys)."""
    h = F.xxhash64(F.lit(seed), F.lit(salt), *keys)
    return F.pmod(h, F.lit(_TWO_53)).cast("double") / F.lit(float(_TWO_53))


def uniform(seed: int, salt: str, lo: float, hi: float, *keys: Column) -> Column:
    """Uniform double in [lo, hi) — reference random.uniform."""
    return F.lit(lo) + unit(seed, salt, *keys) * F.lit(hi - lo)


def randint(seed: int, salt: str, lo: Column | int, hi: Column | int, *keys: Column) -> Column:
    """Uniform integer in [lo, hi] inclusive — reference random.randint."""
    lo_c = F.lit(lo) if isinstance(lo, int) else lo
    hi_c = F.lit(hi) if isinstance(hi, int) else hi
    span = (hi_c - lo_c + F.lit(1)).cast("double")
    return (lo_c + F.floor(unit(seed, salt, *keys) * span)).cast("int")


def choice(seed: int, salt: str, options: list[str], *keys: Column) -> Column:
    """Uniform pick from a constant list — reference random.choice."""
    arr = F.array(*[F.lit(o) for o in options])
    idx = F.floor(unit(seed, salt, *keys) * F.lit(float(len(options)))).cast("int")
    return F.element_at(arr, idx + 1)


def bernoulli(seed: int, salt: str, p: float, *keys: Column) -> Column:
    """True with probability p — reference ``random.random() < p``."""
    return unit(seed, salt, *keys) < F.lit(p)
