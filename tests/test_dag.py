"""Airflow-analog runner semantics (retry, upstream_failed skip, branch
isolation, deterministic order) plus a Spark smoke of the full
seed -> dbt_run -> dbt_test graph."""

from __future__ import annotations

from datetime import date

import pytest

from credit_abs_oltp_to_mart_spark.plans.dag import Dag, credit_mart_dag


def test_topological_order_and_success():
    calls: list[str] = []
    dag = Dag("t")
    dag.task("a", lambda: calls.append("a"))
    dag.task("c", lambda: calls.append("c"), upstream=["a"])
    dag.task("b", lambda: calls.append("b"), upstream=["a"])
    dag.task("d", lambda: calls.append("d"), upstream=["b", "c"])
    res = dag.run()
    assert calls == ["a", "c", "b", "d"]  # insertion-order tiebreak
    assert all(r.state == "success" for r in res.values())


def test_retries_then_success():
    n = {"tries": 0}

    def flaky():
        n["tries"] += 1
        if n["tries"] < 3:
            raise RuntimeError("transient")

    dag = Dag("t")
    dag.task("flaky", flaky, retries=2)
    res = dag.run()
    assert res["flaky"].state == "success"
    assert res["flaky"].attempts == 3


def test_failure_skips_downstream_but_not_siblings():
    calls: list[str] = []
    dag = Dag("t")
    dag.task("bad", lambda: 1 / 0, retries=1)
    dag.task("child", lambda: calls.append("child"), upstream=["bad"])
    dag.task("grandchild", lambda: calls.append("g"), upstream=["child"])
    dag.task("other_branch", lambda: calls.append("other"))
    res = dag.run()
    assert res["bad"].state == "failed" and res["bad"].attempts == 2
    assert "ZeroDivisionError" in res["bad"].error
    assert res["child"].state == "upstream_failed"
    assert res["grandchild"].state == "upstream_failed"
    assert res["other_branch"].state == "success"
    assert calls == ["other"]


def test_duplicate_and_unknown_ids_rejected():
    dag = Dag("t")
    dag.task("a", lambda: None)
    with pytest.raises(ValueError):
        dag.task("a", lambda: None)
    with pytest.raises(ValueError):
        dag.task("b", lambda: None, upstream=["missing"])


@pytest.mark.slow
def test_credit_mart_dag_end_to_end(spark, tmp_path):
    from credit_abs_oltp_to_mart_spark.generator import OLTPSynthConfig

    cfg = OLTPSynthConfig(
        n_borrowers=40,
        n_applications=60,
        n_loans=30,
        start_date_max=date(2025, 12, 31),
        seed=7,
    )
    dag = credit_mart_dag(
        spark, str(tmp_path / "oltp"), str(tmp_path / "marts"), cfg=cfg
    )
    res = dag.run()
    states = {k: r.state for k, r in res.items()}
    assert states == {
        "seed_credit_oltp": "success",
        "dbt_run": "success",
        "dbt_test": "success",
    }
    import os

    assert sorted(os.listdir(tmp_path / "marts"))[0].startswith("fct_")
