"""Date helpers for the mart layer.

Reference operators D1-D3 (SURVEY.md §2.8):
- ``date_trunc('month'|'quarter', d)::date`` → ``F.trunc`` (DateType result;
  Spark's ``F.date_trunc`` returns timestamp and is deliberately avoided).
- Postgres ``age()``-based months-on-book → ``floor(months_between)``; the
  two agree whenever the minuend is a month-start, which it always is here
  (it is a D1 output). Pinned by edge-date tests (tests/test_marts_oracle.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def month_start(d: Column | str) -> Column:
    """``date_trunc('month', d)::date`` (fct_npl_monthly.sql:3 et al.)."""
    return F.trunc(d, "month")


def quarter_start(d: Column | str) -> Column:
    """``date_trunc('quarter', d)::date`` (fct_vintage_mob.sql:15)."""
    return F.trunc(d, "quarter")


def months_on_book(month: Column, origination_date: Column) -> Column:
    """Whole calendar months from origination to ``month``.

    Reference (fct_vintage_mob.sql:17):
    ``(date_part('year', age(m, orig))*12 + date_part('month', age(m, orig)))::int``

    ``month`` is always a month-start (D1 output), so
    ``floor(months_between(month, orig))`` equals the Postgres ``age()``
    month count: for orig day-of-month 1 the value is exactly integral; for
    day-of-month > 1 ``months_between`` yields ``M - (day-1)/31`` whose floor
    is ``M - 1`` — the same whole-month count ``age()`` produces.
    """
    return F.floor(F.months_between(month, origination_date)).cast("int")
