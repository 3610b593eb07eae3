"""dbt-style SQL model runner: execute a directory of dbt models
(``{{ source() }}`` / ``{{ ref() }}`` / ``{{ config() }}``) directly on
Spark SQL.

The reference ships its transformations as dbt models compiled for Postgres
(``dbt/credit_mart/models/**/*.sql``). This runner lets those users keep
their SQL unchanged: it resolves the jinja macros, transpiles the small
Postgres-dialect surface the models use into Spark SQL, topologically
orders models by their ``ref()`` graph, and registers each as a temp view
(optionally writing ``fct_*`` finals to parquet).

Transpile rules (only what the reference model surface needs; each rule is
pinned by tests/test_sql_models.py, which runs the reference's own model
files and compares against the DataFrame marts — themselves verified
against the identical SQL executed in DuckDB):

- ``expr::type`` → ``cast(expr as type)``; Postgres ``numeric`` maps to
  ``decimal(18,2)`` per the engine's type mapping (SURVEY.md §1.2).
- ``date_part('year', age(a,b))*12 + date_part('month', age(a,b))`` →
  ``floor(months_between(a, b))`` — exact because every reference call
  site passes a month-start minuend (fct_vintage_mob.sql:17; see
  functions/dates.py::months_on_book for the proof sketch).
- Aggregate ``FILTER (WHERE ...)``, ``JOIN ... USING``, ordinal
  ``GROUP BY`` pass through — Spark SQL supports them natively.

Scale: the runner adds no materialization barriers — temp views are
logical-plan aliases, so Catalyst optimizes across model boundaries
(filter pushdown from a mart reaches the source scan) exactly as in the
DataFrame pipeline.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_TYPE_MAP = {"numeric": "decimal(18,2)"}

_CONFIG_RE = re.compile(r"\{\{\s*config\s*\([^{}]*\)\s*\}\}")
_SOURCE_RE = re.compile(
    r"\{\{\s*source\s*\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}"
)
_REF_RE = re.compile(r"\{\{\s*ref\s*\(\s*'([^']+)'\s*\)\s*\}\}")
_AGE_MOB_RE = re.compile(
    r"date_part\(\s*'year'\s*,\s*age\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)\s*\)"
    r"\s*\*\s*12\s*\+\s*"
    r"date_part\(\s*'month'\s*,\s*age\(\s*[^,()]+?\s*,\s*[^,()]+?\s*\)\s*\)"
)
_PAREN_CAST_RE = re.compile(r"\)\s*::\s*([A-Za-z_]\w*)")
_IDENT_CAST_RE = re.compile(r"([A-Za-z_][\w.]*)\s*::\s*([A-Za-z_]\w*)")


def _map_type(t: str) -> str:
    return _TYPE_MAP.get(t.lower(), t.lower())


def _replace_paren_casts(sql: str) -> str:
    """``(...)::type`` (incl. ``fn(...)::type``) → ``cast(... as type)``.

    Walks back from the closing paren to its balanced opener plus any
    attached function name, so nested parens and casts inside the operand
    survive; iterates because one pass can reveal another paren cast."""
    while True:
        m = _PAREN_CAST_RE.search(sql)
        if m is None:
            return sql
        close = m.start()  # index of ')'
        depth = 0
        j = close
        while j >= 0:
            if sql[j] == ")":
                depth += 1
            elif sql[j] == "(":
                depth -= 1
                if depth == 0:
                    break
            j -= 1
        k = j
        while k > 0 and (sql[k - 1].isalnum() or sql[k - 1] in "_."):
            k -= 1
        operand = sql[k : close + 1]
        sql = (
            sql[:k]
            + f"cast({operand} as {_map_type(m.group(1))})"
            + sql[m.end() :]
        )


def transpile_postgres(sql: str) -> str:
    """Postgres-dialect model body → Spark SQL (rules in module docstring)."""
    sql = _AGE_MOB_RE.sub(lambda m: f"floor(months_between({m.group(1)}, {m.group(2)}))", sql)
    sql = _replace_paren_casts(sql)
    sql = _IDENT_CAST_RE.sub(
        lambda m: f"cast({m.group(1)} as {_map_type(m.group(2))})", sql
    )
    return sql


def load_models(models_dir: str | Path) -> dict[str, str]:
    """Model name (file stem) → raw SQL for every ``*.sql`` under the dir."""
    return {
        p.stem: p.read_text() for p in sorted(Path(models_dir).rglob("*.sql"))
    }


def _topo_order(deps: dict[str, set[str]]) -> list[str]:
    order: list[str] = []
    done: set[str] = set()
    visiting: set[str] = set()

    def visit(name: str) -> None:
        if name in done:
            return
        if name in visiting:
            raise ValueError(f"ref() cycle involving {name!r}")
        visiting.add(name)
        for d in sorted(deps[name]):
            visit(d)
        visiting.discard(name)
        done.add(name)
        order.append(name)

    for name in sorted(deps):
        visit(name)
    return order


def run_sql_models(
    spark: SparkSession,
    models_dir: str | Path,
    resolve_source: Callable[[str, str], str] | None = None,
    out_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Run every model under ``models_dir`` in dependency order.

    ``resolve_source(schema, table)`` maps a ``{{ source() }}`` reference to
    a Spark table/view name (default: the bare table name — register the
    OLTP tables as temp views first). Each model becomes a temp view under
    its own name; ``fct_*`` models are additionally written to ``out_dir``
    when given. Returns name → DataFrame for every model."""
    resolve = resolve_source or (lambda schema, table: table)
    models = load_models(models_dir)
    deps = {
        name: {r for r in _REF_RE.findall(sql) if r in models}
        for name, sql in models.items()
    }
    results: dict[str, DataFrame] = {}
    for name in _topo_order(deps):
        sql = _CONFIG_RE.sub("", models[name])
        sql = _SOURCE_RE.sub(lambda m: resolve(m.group(1), m.group(2)), sql)
        sql = _REF_RE.sub(lambda m: m.group(1), sql)
        df = spark.sql(transpile_postgres(sql))
        df.createOrReplaceTempView(name)
        results[name] = df
        if out_dir and name.startswith("fct_"):
            df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    return results
