"""Airflow-analog orchestration: dependency-ordered task runs with retry
and skip semantics, plus the reference's DAG re-expressed over Spark jobs.

The reference orchestrates with Airflow
(``airflows/dags/pg_credit_oltp_synth_dag.py:39-51``): a DAG holding one
manually-triggered ``PythonOperator`` that seeds the OLTP schema (no
schedule — ``schedule=None`` — and default retries). What a rebuild owes
is the execution contract, not the Airflow dependency: deterministic
topological ordering, per-task retry with backoff, and Airflow's
upstream-failure semantics (downstream tasks are SKIPPED as
``upstream_failed``, independent branches still run).

``credit_oltp_synth_dag`` mirrors the reference's one-task DAG;
``credit_mart_dag`` wires the full pipeline the reference runs across
Airflow + dbt (seed -> staging/marts -> checks) as one dependency graph.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field


@dataclass
class TaskResult:
    state: str  # success | failed | upstream_failed
    attempts: int
    error: str | None = None


@dataclass
class Task:
    task_id: str
    fn: Callable[[], object]
    upstream: Sequence[str] = ()
    retries: int = 0
    retry_delay_s: float = 0.0


@dataclass
class Dag:
    """Minimal DAG runner with Airflow task semantics.

    ``run`` executes tasks in dependency order. A task failing after its
    retries marks every transitive downstream task ``upstream_failed``
    (never executed); independent branches keep running, so one bad branch
    cannot zero out the whole run — same contract as an Airflow DagRun.
    """

    dag_id: str
    tasks: dict[str, Task] = field(default_factory=dict)

    def task(
        self,
        task_id: str,
        fn: Callable[[], object],
        upstream: Sequence[str] = (),
        retries: int = 0,
        retry_delay_s: float = 0.0,
    ) -> None:
        if task_id in self.tasks:
            raise ValueError(f"duplicate task_id {task_id}")
        for u in upstream:
            if u not in self.tasks:
                raise ValueError(f"unknown upstream {u} for {task_id}")
        self.tasks[task_id] = Task(task_id, fn, tuple(upstream), retries, retry_delay_s)

    def _topo_order(self) -> list[str]:
        order: list[str] = []
        seen: set[str] = set()

        def visit(tid: str) -> None:
            if tid in seen:
                return
            for u in self.tasks[tid].upstream:
                visit(u)
            seen.add(tid)
            order.append(tid)

        # insertion order is the tiebreak -> deterministic schedules
        for tid in self.tasks:
            visit(tid)
        return order

    def run(self) -> dict[str, TaskResult]:
        results: dict[str, TaskResult] = {}
        for tid in self._topo_order():
            t = self.tasks[tid]
            if any(results[u].state != "success" for u in t.upstream):
                results[tid] = TaskResult("upstream_failed", 0)
                continue
            attempts, err = 0, None
            while attempts <= t.retries:
                attempts += 1
                try:
                    t.fn()
                    results[tid] = TaskResult("success", attempts)
                    break
                except Exception as e:  # noqa: BLE001 - retry boundary
                    err = f"{type(e).__name__}: {e}"
                    if attempts <= t.retries and t.retry_delay_s:
                        time.sleep(t.retry_delay_s)
            else:
                results[tid] = TaskResult("failed", attempts, err)
        return results


def credit_oltp_synth_dag(spark, out_dir: str, cfg=None) -> Dag:
    """The reference DAG verbatim: one seed task
    (``pg_credit_oltp_synth_dag.py:46-49`` ``seed_credit_oltp``), writing
    the 17-table lake instead of paged Postgres INSERTs."""
    from credit_abs_oltp_to_mart_spark.generator import (
        OLTPSynthConfig,
        run_credit_oltp_synth,
    )

    cfg = cfg or OLTPSynthConfig()
    dag = Dag("pg_credit_oltp_abs_synth")
    dag.task(
        "seed_credit_oltp",
        lambda: run_credit_oltp_synth(spark, cfg, out_dir=out_dir),
    )
    return dag


def credit_mart_dag(
    spark, oltp_dir: str, marts_dir: str, cfg=None, retries: int = 1
) -> Dag:
    """The full reference flow as one graph: Airflow seed task -> dbt run
    (staging+marts) -> dbt test (checks). The reference splits these across
    Airflow and two dbt invocations; the dependency contract is the same."""
    from credit_abs_oltp_to_mart_spark.generator import (
        OLTPSynthConfig,
        run_credit_oltp_synth,
    )
    from credit_abs_oltp_to_mart_spark.plans.pipeline import run_pipeline

    cfg = cfg or OLTPSynthConfig()
    dag = Dag("credit_mart_build")
    dag.task(
        "seed_credit_oltp",
        lambda: run_credit_oltp_synth(spark, cfg, out_dir=oltp_dir),
        retries=retries,
    )
    dag.task(
        "dbt_run",
        lambda: run_pipeline(spark, oltp_dir, out_dir=marts_dir),
        upstream=["seed_credit_oltp"],
        retries=retries,
    )

    def _checks() -> None:
        from credit_abs_oltp_to_mart_spark.plans.checks import run_schema_tests
        from credit_abs_oltp_to_mart_spark.plans.pipeline import build_staging
        from credit_abs_oltp_to_mart_spark.schemas import ALL_OLTP_TABLES
        from credit_abs_oltp_to_mart_spark.sources.readers import read_oltp_table

        oltp = {t: read_oltp_table(spark, oltp_dir, t) for t in ALL_OLTP_TABLES}
        failures = {
            k: v for k, v in run_schema_tests(build_staging(oltp)).items() if v
        }
        if failures:
            raise AssertionError(f"dbt-style checks failed: {failures}")

    dag.task("dbt_test", _checks, upstream=["dbt_run"])
    return dag
