"""Opt-in capture of foreachBatch-INTERIOR query plans.

The streaming ingest operators do their real work inside ``foreachBatch``
closures; the frame a contract query RETURNS is a post-checkpoint read of
the sink, so ``explain()`` on it shows an 8-line scan stub and the
micro-batch plans — where every optimization to these operators actually
lands — were invisible to the plan record (VERDICT r13 #7).

``capture(df, name)`` is called at the interior frames of each streaming
operator and is a NO-OP unless ``PLAN_CAPTURE_DIR`` is set (tools only —
``tools/capture_stream_plans.py``); when set, it writes the frame's
``explain("formatted")`` text to ``<dir>/<PLAN_CAPTURE_TAG><name>.txt``.
Capture forces analysis/physical planning of the frame (cost accepted in
capture runs), never executes it, and swallows its own failures so a
capture bug can never take down an ingest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

PLAN_CAPTURE_DIR: str | None = None
PLAN_CAPTURE_TAG: str = ""


def capture(df: DataFrame, name: str) -> None:
    if PLAN_CAPTURE_DIR is None:
        return
    try:
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(
            PLAN_CAPTURE_DIR, f"{PLAN_CAPTURE_TAG}{name}.txt"
        )
        with open(path, "w") as f:
            f.write(text)
    except Exception:
        pass
