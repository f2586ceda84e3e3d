"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference's only "source" is a driver-side text file read
(``SVDMovieLensSparkJava.java:191-195``, S1/S2 in SURVEY §2); the engine's
readers.py covers those. This module exercises the OTHER half of a
Spark-native engine's source surface: the extension point for sources
Spark has no built-in reader for (internal services, proprietary
formats, synthetic load generators). PySpark 4 lets those be written in
pure Python with real planner integration — schema projection, input
partitions (one ``read()`` call per partition, executed distributed),
and filter pushdown via ``pushFilters``.

The shipped source is a deterministic synthetic document corpus:

- every row is a pure function of ``doc_id`` through the portable md5
  hash family (``functions/hashing.py`` convention:
  ``int(md5(s)[:8], 16)``), so the SAME corpus is replayable in DuckDB
  SQL with ``generate_series`` + ``md5`` — the catalog query
  ``synthetic_source_stats`` oracle-gates the source bit-exactly,
  including the text BYTES (per-doc text fingerprints, summed per lang);
- ``partitions()`` splits the id range into ``n_partitions`` disjoint
  chunks — generation is partition-count-invariant by construction, so
  the chaos tests can vary parallelism freely;
- ``pushFilters`` handles ``lang = '<x>'`` equality source-side (rows of
  other langs are never generated), the pushdown shape a real external
  source would use to avoid materialising 100 TB it can filter at the
  origin. All other filters are returned to Spark unhandled.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

LANGS = ("en", "de", "fr", "es", "zh")

# 32-word vocabulary (power of two keeps the index hash unbiased)
VOCAB = (
    "key", "agg", "row", "scan", "slow", "fast", "table", "value",
    "part", "hash", "merge", "batch", "spark", "order", "data", "column",
    "join", "small", "line", "customer", "query", "big", "a", "the",
    "sort", "window", "group", "filter", "stream", "vector", "grid", "plan",
)

MIN_WORDS, WORD_SPAN = 10, 90  # n_words in [10, 99], matching the fixture shape


def _h(s: str) -> int:
    """Portable md5 prefix hash — twin of functions/hashing.py
    portable_hash64 and the DuckDB ``_H`` fragment."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def gen_doc(doc_id: int) -> tuple[int, str, str, int]:
    """(doc_id, lang, text, n_words) — pure function of doc_id."""
    lang = LANGS[_h(f"{doc_id}|l") % len(LANGS)]
    n_words = MIN_WORDS + _h(f"{doc_id}|n") % WORD_SPAN
    words = [VOCAB[_h(f"{doc_id}|w{j}") % len(VOCAB)] for j in range(n_words)]
    return doc_id, lang, " ".join(words), n_words


def synthetic_docs_oracle_sql(n_docs: int) -> str:
    """DuckDB replay of the generator: same hashes, same words, same text
    bytes. Used by the catalog oracle; also handy for external audits."""
    from ..functions.hashing import oracle_hash_sql

    vocab = "[" + ", ".join(f"'{w}'" for w in VOCAB) + "]"
    langs = "[" + ", ".join(f"'{l}'" for l in LANGS) + "]"
    h = oracle_hash_sql("{s}")
    return f"""
    WITH ids AS (SELECT unnest(generate_series(0, {n_docs - 1})) AS doc_id),
    d AS (
      SELECT doc_id,
             {langs}[1 + {h.format(s="concat(doc_id, '|l')")} % {len(LANGS)}] AS lang,
             CAST({MIN_WORDS} + {h.format(s="concat(doc_id, '|n')")} % {WORD_SPAN}
                  AS INTEGER) AS n_words
      FROM ids),
    t AS (
      SELECT doc_id, lang, n_words,
             list_aggregate(
               list_transform(generate_series(0, n_words - 1),
                              j -> {vocab}[1 + {h.format(s="concat(doc_id, '|w', j)")} % {len(VOCAB)}]),
               'string_agg', ' ') AS text
      FROM d)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS sum_words,
           CAST(min(n_words) AS BIGINT) AS min_words,
           CAST(max(n_words) AS BIGINT) AS max_words,
           CAST(sum({h.format(s='text')}) AS BIGINT) AS text_fp
    FROM t GROUP BY lang
    """


def _build():
    """Class definitions deferred so importing this module never requires
    a live Spark (mirrors the import-try gating convention elsewhere)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        EqualTo,
        InputPartition,
    )

    @dataclass
    class _Range(InputPartition):
        start: int
        end: int

    class SyntheticDocsReader(DataSourceReader):
        def __init__(self, options):
            self.n_docs = int(options.get("n_docs", 1000))
            self.n_partitions = int(options.get("n_partitions", 8))
            self.lang_eq: str | None = None

        def pushFilters(self, filters):
            for f in filters:
                # ("lang",) equality is generated source-side; pruning it
                # here means non-matching rows are never materialised
                if isinstance(f, EqualTo) and f.attribute == ("lang",):
                    self.lang_eq = f.value
                else:
                    yield f  # unhandled -> Spark keeps its own Filter

        def partitions(self):
            n = max(1, self.n_partitions)
            chunk = -(-self.n_docs // n)  # ceil — ids [start, end) per split
            return [
                _Range(i * chunk, min((i + 1) * chunk, self.n_docs))
                for i in range(n)
                if i * chunk < self.n_docs
            ]

        def read(self, partition):
            for doc_id in range(partition.start, partition.end):
                row = gen_doc(doc_id)
                if self.lang_eq is not None and row[1] != self.lang_eq:
                    continue
                yield row

    class SyntheticDocsStreamReader(DataSourceStreamReader):
        """Micro-batch stream of the SAME corpus the batch reader yields
        (same ids → same bytes): each ``latestOffset`` call releases the
        next ``batch_docs`` ids up to ``n_docs``, ``partitions`` splits the
        [start, end) id range, and rows are generated executor-side in
        ``read`` — the partition-planned stream reader (not the driver-side
        Simple variant), matching how a real high-rate source scales.
        Offsets are plain ``{"id": n}`` dicts, so checkpoint replay
        re-generates identical rows (determinism IS the replay contract).

        Restart safety: ``_latest`` is driver-memory pacing state, lost on
        restart — so it re-syncs to MAX of every offset Spark hands back:
        ``partitions`` clamps by both its start (the offset log's
        committed position) and end, and ``commit`` covers committed
        batches. Without the re-sync a restarted query would re-emit
        already-committed id ranges. Gated by a real stop/restart test —
        mid-stream AND on a fully-drained checkpoint —
        tests/test_streaming_live.py::
        test_python_datasource_stream_restart_no_reemission."""

        def __init__(self, options):
            self.n_docs = int(options.get("n_docs", 1000))
            self.batch_docs = int(options.get("batch_docs", 100))
            self.n_partitions = int(options.get("n_partitions", 4))
            self._latest = 0

        def initialOffset(self):
            return {"id": 0}

        def latestOffset(self):
            self._latest = min(self._latest + self.batch_docs, self.n_docs)
            return {"id": self._latest}

        def partitions(self, start, end):
            lo, hi = start["id"], end["id"]
            # checkpoint re-sync — clamp by BOTH ends: lo is the offset
            # log's committed position, so even a call order where a
            # fresh reader's latestOffset fired first can never regress
            # the pacing below an offset Spark already recorded
            self._latest = max(self._latest, hi, lo)
            n = max(1, self.n_partitions)
            chunk = max(1, -(-(hi - lo) // n))
            return [
                _Range(s, min(s + chunk, hi)) for s in range(lo, hi, chunk)
            ] or [_Range(lo, hi)]

        def read(self, partition):
            for doc_id in range(partition.start, partition.end):
                yield gen_doc(doc_id)

        def commit(self, end):
            self._latest = max(self._latest, end["id"])  # checkpoint re-sync

    class SyntheticDocsDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_docs"

        def schema(self):
            return "doc_id bigint, lang string, text string, n_words int"

        def reader(self, schema):
            return SyntheticDocsReader(self.options)

        def streamReader(self, schema):
            return SyntheticDocsStreamReader(self.options)

    return SyntheticDocsDataSource


def register_synthetic_docs(spark) -> None:
    """Idempotent registration of the ``synthetic_docs`` format.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (runtime
    conf, default false in 4.1): Spark refuses to even initialise a
    Python reader that IMPLEMENTS pushFilters while the flag is off, and
    the driver owns the session so the flag can't be assumed."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(_build())
