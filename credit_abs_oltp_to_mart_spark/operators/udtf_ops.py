"""Python UDTF surface (the last §2.12 UDF family).

The reference's only extensibility point is SQL macros inside dbt models;
this repo covers every Spark UDF family — scalar pandas, grouped-map,
grouped-agg, cogrouped-map, map-partitions, stateful — and this module
adds the table function: a Python UDTF consumed via LATERAL join, the
Spark-4 shape for one-row-to-many-rows expansion with per-row arguments.

A UDTF is the slow path (row-at-a-time Python, pickled rows — no Arrow
batching as of Spark 4), so the rule from the repo's UDF policy applies
doubly: use it only when the expansion logic genuinely needs Python.
The sentence splitter here is deliberately SQL-expressible so the oracle
can verify the UDTF machinery itself (same fixed-delimiter semantics as
``split`` + ``posexplode``); a real use is a custom tokenizer or parser
library. At scale the LATERAL join stays map-only — each partition
expands independently, no shuffle.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sentence_no int, sentence string, n_chars int")
class SplitSentencesUDTF:
    """Split text on '. ' — 1-based part numbering, empty parts skipped
    (numbering still counts them, matching SQL list indexing)."""

    def eval(self, text):  # noqa: ANN001 — UDTF signature is positional
        if text is None:
            return
        for i, s in enumerate(text.split(". ")):
            if s:
                yield i + 1, s, len(s)


def register_udtfs(spark) -> None:
    spark.udtf.register("split_sentences", SplitSentencesUDTF)
