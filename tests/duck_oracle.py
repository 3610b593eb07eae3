"""DuckDB oracle helpers: run reference SQL over the generated parquet lake
and compare against Spark DataFrames (order-insensitive, float-tolerant)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

# Staging views — the reference staging SQL with ``{{ source(...) }}``
# replaced by parquet scans (dbt/credit_mart/models/staging/*.sql, verbatim
# otherwise).
_STAGING_VIEWS = {
    "stg_loan_contract": """
        select loan_id::bigint as loan_id, borrower_id::bigint as borrower_id,
               application_id::bigint as application_id, product_type, currency,
               origination_date::date as origination_date,
               disbursement_date::date as disbursement_date,
               maturity_date::date as maturity_date,
               principal_original::numeric as principal_original,
               principal_current::numeric as principal_current,
               term_months::int as term_months, interest_rate_type,
               interest_rate_current::numeric as interest_rate_current,
               repayment_method, payment_frequency,
               grace_period_months::int as grace_period_months, status
        from parquet_scan('{d}/loan_contract.parquet/*.parquet')
    """,
    "stg_arrears_daily": """
        select loan_id::bigint as loan_id, as_of_date::date as as_of_date,
               days_past_due::int as days_past_due,
               past_due_amount_total::numeric as past_due_amount_total,
               past_due_principal::numeric as past_due_principal,
               past_due_interest::numeric as past_due_interest,
               past_due_fees::numeric as past_due_fees,
               oldest_unpaid_due_date::date as oldest_unpaid_due_date,
               early_arrears_flag::boolean as early_arrears_flag,
               default_flag::boolean as default_flag,
               nonperforming_flag::boolean as nonperforming_flag,
               case when days_past_due <= 0 then '0'
                    when days_past_due between 1 and 30 then '1-30'
                    when days_past_due between 31 and 60 then '31-60'
                    when days_past_due between 61 and 90 then '61-90'
                    else '90+' end as dpd_bucket,
               (coalesce(nonperforming_flag,false) or coalesce(default_flag,false)
                or days_past_due > 90) as npl_flag
        from parquet_scan('{d}/arrears_dpd_status.parquet/*.parquet')
    """,
    "stg_payments": """
        select payment_id::bigint as payment_id, loan_id::bigint as loan_id,
               payment_date::date as payment_date, value_date::date as value_date,
               currency, amount_received::numeric as amount_received,
               payment_channel, external_reference, status
        from parquet_scan('{d}/repayment_payment.parquet/*.parquet')
    """,
    "stg_writeoff_recovery": """
        select loan_id::bigint as loan_id, writeoff_date::date as writeoff_date,
               writeoff_amount_principal::numeric as writeoff_amount_principal,
               writeoff_amount_interest::numeric as writeoff_amount_interest,
               writeoff_amount_fees::numeric as writeoff_amount_fees,
               recovery_amount::numeric as recovery_amount,
               recovery_date::date as recovery_date
        from parquet_scan('{d}/write_off_and_recovery.parquet/*.parquet')
    """,
}


def connect_with_staging(oltp_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name, sql in _STAGING_VIEWS.items():
        con.execute(f"CREATE VIEW {name} AS {sql.format(d=oltp_dir)}")
    return con


def _dt_to_float(s: pd.Series) -> pd.Series:
    v = pd.to_datetime(s)
    if getattr(v.dtype, "tz", None) is not None:
        v = v.dt.tz_localize(None)
    v = v.astype("datetime64[ns]")
    iv = v.astype("int64").astype("float64")
    iv[v.isna()] = np.nan
    return iv


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values. Decimals/numerics ->
    float64; dates/timestamps -> float64 epoch-ns (so Spark date objects and
    DuckDB datetime64 compare identically). Type inference is by inspecting
    non-null values, never by pd.to_datetime guessing."""
    import datetime as _dt

    out = df.copy()
    for c in out.columns:
        s = out[c]
        if str(s.dtype).startswith("datetime"):
            out[c] = _dt_to_float(s)
        elif s.dtype == object:
            nn = s.dropna()
            if len(nn) == 0:
                out[c] = s.astype("float64")
            elif nn.map(
                lambda v: hasattr(v, "quantize") or isinstance(v, (int, float))
            ).all():
                out[c] = s.astype("float64")
            elif nn.map(
                lambda v: isinstance(v, (_dt.date, _dt.datetime, pd.Timestamp))
            ).all():
                out[c] = _dt_to_float(s)
    out = out[sorted(out.columns)]
    return out.sort_values(list(out.columns), na_position="last").reset_index(drop=True)


def _dtype_class(s: pd.Series) -> str:
    """Canonical dtype class for driver-hash parity. The driver's value hash
    is dtype-sensitive: an int64 136 and a float64 136.0 hash differently
    (round-1 red rows were exactly this: DuckDB HUGEINT -> pandas float64 vs
    Spark int64). Classes must MATCH between Spark and oracle outputs."""
    import datetime as _dt
    import decimal as _decimal

    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in "mM":
        return "datetime"
    nn = s.dropna()
    if len(nn) == 0:
        return "empty"
    v = nn.iloc[0]
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, _decimal.Decimal):
        return "decimal"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, (_dt.date, _dt.datetime, pd.Timestamp)):
        return "datetime"
    return "str"


def assert_frames_match(
    spark_df,
    duck_df: pd.DataFrame,
    rtol: float = 1e-9,
    atol: float = 1e-12,
    strict_dtypes: bool = True,
) -> None:
    """rtol=0, atol=0 asserts BIT-EXACT float equality — the driver's
    value-hash gate standard (all contract queries are designed to meet
    it: exact decimal accumulation, deterministic double conversions,
    portable rounding). ``strict_dtypes`` (default) also rejects
    cross-engine dtype-class drift (int vs float, decimal vs double)
    BEFORE value comparison, because the driver's canonical value hash is
    dtype-sensitive even when values are numerically equal. Pass
    strict_dtypes=False for reference-parity comparisons that are about
    VALUES, not the driver hash (e.g. decimal marts vs float oracles).
    ``spark_df`` may also be an already-collected pandas frame (callers
    that need the row count anyway can collect once instead of paying a
    second full plan execution here)."""
    raw_a = spark_df.toPandas() if hasattr(spark_df, "toPandas") else spark_df
    raw_b = duck_df
    for c in sorted(set(raw_a.columns) & set(raw_b.columns)) if strict_dtypes else []:
        ca, cb = _dtype_class(raw_a[c]), _dtype_class(raw_b[c])
        if "empty" in (ca, cb):
            continue
        assert ca == cb, (
            f"column {c} dtype class differs: spark={ca} ({raw_a[c].dtype}) vs "
            f"oracle={cb} ({raw_b[c].dtype}) — driver value hash would mismatch "
            f"even if values are equal (e.g. 136 vs 136.0)"
        )
    a = normalize(raw_a)
    b = normalize(raw_b)
    assert list(a.columns) == list(b.columns), f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"row counts differ: {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind in "fc" or bv.dtype.kind in "fc":
            av = av.astype("float64")
            bv = bv.astype("float64")
            both_nan = av.isna() & bv.isna()
            if rtol == 0 and atol == 0:
                ok = both_nan | (av.values == bv.values)
            else:
                ok = both_nan | np.isclose(av, bv, rtol=rtol, atol=atol, equal_nan=True)
            assert ok.all(), f"column {c} differs:\n{a[~ok].head()}\n{b[~ok].head()}"
        else:
            ok = (av == bv) | (av.isna() & bv.isna())
            assert ok.all(), f"column {c} differs:\n{a[~ok].head()}\n{b[~ok].head()}"
