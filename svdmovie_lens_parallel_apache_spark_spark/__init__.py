"""svdmovie_lens_parallel_apache_spark_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``it21208/SVDMovie-Lens-Parallel-Apache-Spark`` (a Spark-1.6
RDD port of the Timely-Development Funk-SVD MovieLens recommender), widened
into a general analytics + training-data-pipeline engine:

- relational surface (scan/filter/project/join/agg/window/top-k) — pure
  DataFrame/Catalyst, no custom planner needed (SURVEY.md §4);
- recommender core: MLlib ALS + the reference's exact clamp-fold predictor
  semantics (reference ``SVDMovieLensSparkJava.java:499-513``);
- large-scale pipeline operators: dedup (exact/minhash/simhash/jaccard),
  embedding similarity search, text analysis, multimodal plumbing;
- a transactional snapshot-table format (time travel, CDC, branches,
  DML, compaction, stats/bloom/partition pruning) with streaming
  sources/sinks and incrementally-maintained materialized views
  (``sources/materialized_view.py``);
- batch + Structured Streaming window aggregation over event streams.

Everything is declared through the DataFrame API so Catalyst/Tungsten/AQE
choose physical plans; Python UDFs are confined to Arrow-batched pandas
paths where column expressions genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
