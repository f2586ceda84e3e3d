"""Runtime stage-metric probes: measured shuffle/input bytes per query.

Plan-shape assertions (``plans.explain``) prove the STRUCTURE is right;
this module proves the VOLUME is right — the cheap canary for an
accidental pair-explosion (a dedup/ANN edit whose candidate set quietly
goes quadratic still type-checks and still matches its oracle at sf0.01,
but its shuffle-write bytes blow past any sane multiple of its input).

Reads Spark's AppStatusStore through the JVM gateway (the same store the
UI serves); works with ``spark.ui.enabled=false``. Per-query attribution
is by stage-id set difference, which is robust to the store evicting OLD
stages mid-run (cumulative-sum diffing is not).

MEASURED CAVEAT (verified empirically: an sf0.01 and an sf0.1 documents
scan both report ~3.4 KB): under local-mode Spark 4 the stage-level
``input_bytes`` reflects per-file fixed accounting from the vectorized
parquet reader, NOT bytes actually scanned. Consequently the audit's
``amplification`` (= shuffle_write / input) is a RELATIVE per-query
fingerprint — stable for a given fixture + SF, so regression-comparable
against a committed baseline — never an absolute data-amplification
ratio, and never comparable ACROSS scale factors. The absolute
pair-explosion detector is therefore the cross-SF SHUFFLE-WRITE growth
gate (sw(sf0.1)/sw(sf0.01) ≈ 10 for linear operators, ~100 for
quadratic — tests/test_shuffle_guard.py), which compares sw against sw
and needs no input denominator.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class StageMetricsProbe:
    """Attribute executed-stage metrics to a window of work.

    Usage::

        probe = StageMetricsProbe(spark)
        before = probe.seen_stages()
        df.count()
        m = probe.delta(before)   # {'shuffle_write_bytes': ..., 'input_bytes': ...}
    """

    def __init__(self, spark: SparkSession):
        self._spark = spark
        sc = spark.sparkContext
        self._store = sc._jsc.sc().statusStore()
        gw = sc._gateway
        self._empty = gw.jvm.java.util.Collections.emptyList()
        self._no_quantiles = gw.new_array(gw.jvm.double, 0)

    def _stages(self):
        seq = self._store.stageList(self._empty, False, False, self._no_quantiles, self._empty)
        return [seq.apply(i) for i in range(seq.size())]

    def seen_stages(self) -> set:
        return {(s.stageId(), s.attemptId()) for s in self._stages()}

    def delta(self, since: set) -> dict:
        """Metrics summed over stages that appeared after ``since``.

        Retention caveat: the store keeps ``spark.ui.retainedStages``
        (default 1000) most-recent stages — a single window of work must
        not span more than that many stages for exact attribution.
        """
        new = [s for s in self._stages() if (s.stageId(), s.attemptId()) not in since]
        return {
            "n_stages": len(new),
            "input_bytes": sum(s.inputBytes() for s in new),
            "output_bytes": sum(s.outputBytes() for s in new),
            "shuffle_write_bytes": sum(s.shuffleWriteBytes() for s in new),
            "shuffle_read_bytes": sum(s.shuffleReadBytes() for s in new),
        }
