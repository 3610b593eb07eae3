"""Blocked fuzzy (edit-distance) matching.

Entity-resolution primitive the reference lacks: match dirty strings
(OCR'd names, re-keyed account holders) to a canonical table. All-pairs
Levenshtein is O(N*M) — never viable; the standard scale shape is
block-then-verify, same as the dedup family in ``dedup.py``: a cheap
equi-join on blocking keys bounds the candidate set, the exact (expensive)
distance runs only inside blocks, and an argmin window picks the best
match with a total tiebreak.

Levenshtein is evaluated JVM-side (whole-stage codegen, unit costs), and
has identical semantics in DuckDB, so results stay oracle-checkable.
Blocking keys must be corruption-invariant (a key the noise can't change —
here: attributes carried alongside the string, or phonetic/length buckets
in general); recall is bounded by the blocking choice, which is the
documented trade.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_match(
    probes: DataFrame,
    candidates: DataFrame,
    *,
    probe_id: str,
    probe_col: str,
    cand_id: str,
    cand_col: str,
    block_cols: Sequence[str],
    max_distance: int,
) -> DataFrame:
    """Best candidate per probe within the same block, by edit distance.

    Output: *probe_id*, *cand_id*, ``distance`` (int). Probes with no
    candidate within ``max_distance`` are dropped. Tiebreak: smallest
    distance, then smallest candidate id — total, so deterministic.
    """
    blocks = list(block_cols)
    scored = (
        probes.join(candidates, blocks)
        .select(
            probe_id,
            cand_id,
            F.levenshtein(F.col(probe_col), F.col(cand_col)).alias(
                "distance"
            ),
        )
        .where(F.col("distance") <= max_distance)
    )
    w = Window.partitionBy(probe_id).orderBy(
        F.col("distance").asc(), F.col(cand_id).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
