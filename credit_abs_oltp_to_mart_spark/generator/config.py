"""Generator configuration — mirrors the reference's OLTPSynthConfig
(pg_oltp_synth.py:21-60) field-for-field, minus Postgres/Faker plumbing."""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date


@dataclass
class OLTPSynthConfig:
    # volume (pg_oltp_synth.py:26-28)
    n_borrowers: int = 2000
    n_applications: int = 3000
    n_loans: int = 1500

    # realism controls (pg_oltp_synth.py:31-34)
    start_date_min: date = date(2015, 1, 1)
    start_date_max: date | None = None  # None -> current_date (reference: today)
    max_term_months: int = 72

    # id floors (pg_oltp_synth.py:36-37)
    min_borrower_id: int = 10_000
    min_application_id: int = 100_000_000

    # behavior distributions (pg_oltp_synth.py:40-45)
    p_variable_rate: float = 0.35
    p_direct_debit: float = 0.55
    p_late_installment: float = 0.18
    p_partial_payment: float = 0.10
    p_default: float = 0.03
    p_forbearance: float = 0.05

    # rates / fees (pg_oltp_synth.py:48-52)
    annual_rate_min: float = 0.03
    annual_rate_max: float = 0.22
    penalty_rate_annual: float = 0.12
    late_fee_amount_min: float = 5.0
    late_fee_amount_max: float = 40.0

    # snapshots (pg_oltp_synth.py:55-56)
    build_daily_snapshots: bool = True
    snapshot_days_per_loan: int = 180

    seed: int = 42
