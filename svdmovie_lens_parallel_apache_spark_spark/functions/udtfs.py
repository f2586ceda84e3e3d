"""Python UDTFs — the third Spark-4 Python extension point.

With the custom batch/stream DataSource (``sources/python_datasource.py``)
and the two-phase DataSink (``sources/python_datasink.py``), user-defined
TABLE functions complete the engine's Python extension surface: an
operator that maps one input row to MANY output rows with custom logic,
callable from SQL via ``LATERAL``. The reference has no extension points
at all (801-line fixed-function job); a 100 TB pipeline grows them.

Same discipline as the codec boundary: Python UDTFs are the SLOW path
(per-row Python, even Arrow-transported) and never belong in relational
hot paths — the JVM-only plan gate (tests/test_plans.py) skips only the
``udtf_`` demo family. The demo splits documents into sentences with a
deliberately trivial, engine-portable rule (literal ``'. '`` split,
empties dropped, index AFTER filtering) so a DuckDB oracle replays it
bit-for-bit — the same exact-twin treatment every other operator gets.
"""

from __future__ import annotations


def _build():
    """Deferred so importing this module never requires a live Spark."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sent_idx int, sentence string")
    class SentenceExplode:
        """One output row per sentence: split on the literal '. ',
        drop empty fragments, index over the SURVIVORS (the rule the
        DuckDB twin replays — see catalog udtf_sentence_explode)."""

        def eval(self, doc_id, text):
            if text is None:
                return
            parts = [p for p in text.split(". ") if p != ""]
            for i, p in enumerate(parts):
                yield doc_id, i, p

    return SentenceExplode


def register_udtfs(spark) -> None:
    """Idempotent registration of the demo UDTF family."""
    spark.udtf.register("sentence_explode", _build())
