"""CDC apply: merge a change feed into a snapshot (MERGE INTO semantics).

The reference's load path is full-refresh: the dbt models rebuild every
mart from the OLTP tables each run (SURVEY.md §3; `plans/incremental.py`
already narrows that to changed month-partitions). This operator covers
the remaining ingestion shape — applying an upsert/delete change feed
(Debezium-style I/U/D rows) to a keyed snapshot, which is how the OLTP
side itself would be maintained on a lake.

Scale design — whole-row upserts never shuffle the target: the result is

    target ANTI JOIN change_keys   UNION ALL   latest non-delete changes

and a change feed is tiny relative to the snapshot, so the anti join
broadcasts the change keys: the target branch stays map-only (scan →
broadcast-probe → write), no Exchange on 100 TB of snapshot. Compare the
full-outer-join formulation of MERGE, which shuffles both sides on the
key; that shape is only needed for partial-column updates. If the feed
carries several versions of a key, the latest wins (``seq_col`` ordering,
resolved with one window over the feed only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    op_col: str = "op",
    seq_col: str | None = None,
    broadcast_changes: bool = True,
) -> DataFrame:
    """New snapshot after applying ``changes`` to ``target``.

    ``changes`` must have the target's columns plus ``op_col`` with values
    'I' / 'U' / 'D' (insert / update / delete — I and U are both upserts of
    the full row). With ``seq_col``, only each key's highest-seq change
    applies (and the seq column is dropped from the output). Set
    ``broadcast_changes=False`` when the feed is too large to broadcast —
    the same plan then shuffles both sides on the key.
    """
    if seq_col is not None:
        w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
        changes = (
            changes.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", seq_col)
        )
    keys = changes.select(key).distinct()
    if broadcast_changes:
        keys = F.broadcast(keys)
    kept = target.join(keys, key, "left_anti")
    upserts = changes.where(F.col(op_col) != "D").drop(op_col)
    return kept.unionByName(upserts.select(*target.columns))
