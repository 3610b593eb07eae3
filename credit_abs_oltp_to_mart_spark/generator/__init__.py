"""Distributed synthetic credit-OLTP generator (the reference's
airflows/generator/pg_oltp_synth.py re-expressed as a Spark dataflow)."""

from credit_abs_oltp_to_mart_spark.generator.config import OLTPSynthConfig
from credit_abs_oltp_to_mart_spark.generator.generate import run_credit_oltp_synth

__all__ = ["OLTPSynthConfig", "run_credit_oltp_synth"]
