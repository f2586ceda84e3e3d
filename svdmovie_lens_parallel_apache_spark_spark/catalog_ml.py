"""Catalog part 3: recommender queries (the reference's core capability).

- ``funk_clamped_predict`` / ``recsys_eval_metrics``: EXACT oracle parity
  for the reference's order-dependent clamp-fold predictor (U2,
  ``SVDMovieLensSparkJava.java:499-513``) and its evaluation metrics (M2,
  lines 393/470), over deterministic md5-derived golden factors — the
  DuckDB oracle replays the identical fold.
- ``als_top_recs``: MLlib ALS end-to-end (train → recommend) on the
  deterministic synthetic ratings; rows-only (iterative ML, not
  SQL-expressible — SURVEY.md §5 tier 2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import _R, _t, register
from .functions.scalar import portable_round as _r
from .functions.vectors import clamped_fold
from .operators.stats import error_metrics
from .recsys import (
    ALSConfig,
    golden_factor_vec,
    movielens_replay,
    synthetic_ratings,
    train_als,
)

_H_EVENT = "CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)"


def _h_sql(key_expr: str) -> str:
    return f"CAST(concat('0x', substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8)) AS BIGINT)"


def _gf_sql(kind: str, id_expr: str, rank: int = 8) -> str:
    """DuckDB twin of recsys.golden_factor_vec."""
    h = _h_sql(f"concat('{kind}|', {id_expr}, '|', i)")
    return (
        f"list_transform(generate_series(1, {rank}), "
        f"i -> CAST({h} AS DOUBLE) / 4294967296.0 * 0.4 - 0.2)"
    )


_RATINGS_CTE = f"""
    r AS (
      SELECT user_id,
             event_id % 200                 AS item_id,
             1 + {_H_EVENT} % 5             AS rating
      FROM events),
    v AS (
      SELECT user_id, item_id, rating,
             {_gf_sql('uf', 'user_id')} AS uvec,
             {_gf_sql('if', 'item_id')} AS ivec
      FROM r),
    p AS (
      SELECT user_id, item_id, rating,
             list_reduce(
               list_prepend(CAST(1.0 AS DOUBLE),
                 list_transform(generate_series(1, 8), i -> uvec[i] * ivec[i])),
               (acc, x) -> least(5.0, greatest(1.0, acc + x))) AS pred
      FROM v)
"""


@register(
    "funk_clamped_predict",
    f"""
    WITH {_RATINGS_CTE}
    SELECT user_id, item_id, rating, {_R('pred', 6)} AS prediction
    FROM p
    """,
    tags=("U2", "J3", "M1-parity"),
    description="Reference predictor U2 exact parity: per-feature clamp fold "
    "(order-dependent, SVDMovieLensSparkJava.java:499-513) over md5-derived golden "
    "factor vectors, broadcast-joined to the rating pairs. Oracle replays the "
    "identical fold; results match bit-for-bit.",
)
def q_funk_clamped_predict(spark, sf_dir):
    r = synthetic_ratings(spark, sf_dir, n_items=200)
    uvec = golden_factor_vec(F.col("user_id"), "uf", 8)
    ivec = golden_factor_vec(F.col("item_id"), "if", 8)
    return r.select(
        "user_id",
        "item_id",
        "rating",
        _r(clamped_fold(uvec, ivec), 6).alias("prediction"),
    )


@register(
    "recsys_eval_metrics",
    f"""
    WITH {_RATINGS_CTE}
    SELECT count(*)                                                AS n,
           {_R('avg(abs(rating - pred))', 6)}                      AS mae,
           {_R('sqrt(avg((rating - pred) * (rating - pred)))', 6)} AS rmse
    FROM p
    """,
    tags=("M2", "A6", "A7", "U4"),
    description="RMSE/MAE of the clamp-fold predictor over the synthetic ratings — the "
    "reference's quality metrics (lines 393, 470) in one aggregation pass.",
)
def q_recsys_eval_metrics(spark, sf_dir):
    r = synthetic_ratings(spark, sf_dir, n_items=200)
    uvec = golden_factor_vec(F.col("user_id"), "uf", 8)
    ivec = golden_factor_vec(F.col("item_id"), "if", 8)
    preds = r.withColumn("prediction", clamped_fold(uvec, ivec))
    m = error_metrics(preds, "rating", "prediction")
    return m.select("n", _r(F.col("mae"), 6).alias("mae"), _r(F.col("rmse"), 6).alias("rmse"))


# Pinned VALUES oracle for als_top_recs, legitimate for the same reason
# as als_replay_hash's pinned md5: the input block is fixture-free
# (md5-derived), and ALS factors are bit-stable across session shapes
# (chaos-tested under local[2]/7, local[4]/8, local[32]/32), so the
# recommended ITEM IDS AND RANKS are a cross-round engine invariant. Any
# training/ranking regression reorders or swaps ids and fails the gate.
_ALS_TOP_RECS_ROWS = (
    "(0,1,153),(0,2,197),(0,3,20),(0,4,142),(0,5,116),(1,1,178),(1,2,6),"
    "(1,3,62),(1,4,24),(1,5,126),(2,1,132),(2,2,4),(2,3,88),(2,4,139),"
    "(2,5,194),(3,1,197),(3,2,153),(3,3,38),(3,4,20),(3,5,142),(4,1,191),"
    "(4,2,117),(4,3,22),(4,4,75),(4,5,102),(5,1,99),(5,2,40),(5,3,0),"
    "(5,4,3),(5,5,188),(6,1,17),(6,2,141),(6,3,77),(6,4,120),(6,5,80),"
    "(7,1,4),(7,2,20),(7,3,132),(7,4,153),(7,5,39),(8,1,123),(8,2,61),"
    "(8,3,193),(8,4,79),(8,5,134),(9,1,20),(9,2,153),(9,3,4),(9,4,39),"
    "(9,5,157),(10,1,164),(10,2,131),(10,3,39),(10,4,129),(10,5,85),"
    "(11,1,129),(11,2,34),(11,3,125),(11,4,188),(11,5,56),(12,1,99),"
    "(12,2,0),(12,3,123),(12,4,146),(12,5,19),(13,1,99),(13,2,123),"
    "(13,3,146),(13,4,19),(13,5,76),(14,1,153),(14,2,39),(14,3,20),"
    "(14,4,56),(14,5,142),(15,1,129),(15,2,188),(15,3,126),(15,4,177),"
    "(15,5,0),(16,1,99),(16,2,3),(16,3,134),(16,4,138),(16,5,110),"
    "(17,1,83),(17,2,193),(17,3,160),(17,4,138),(17,5,100),(18,1,123),"
    "(18,2,132),(18,3,33),(18,4,4),(18,5,48),(19,1,105),(19,2,117),"
    "(19,3,121),(19,4,26),(19,5,102)"
)


@register(
    "als_top_recs",
    "SELECT * FROM (VALUES "
    + _ALS_TOP_RECS_ROWS
    + ") AS t(user_id, rank, item_id)",
    tags=("M1", "ALS", "ml"),
    description="MLlib ALS end-to-end on the FIXTURE-FREE dense low-rank block "
    "(rank=8): train, then top-5 recommendations for users < 20. The Spark-native "
    "replacement for the reference's driver-side Funk-SVD (SURVEY.md §2 M1). "
    "Oracle = the pinned 100-row (user, rank, item) table — ids and ranks are "
    "bit-stable engine invariants because the input is md5-derived and ALS's "
    "block partitioner is independent of session shape (see als_replay_hash); "
    "metric-level parity with the reference asserted in tests/test_recsys.py.",
)
def q_als_top_recs(spark, sf_dir):
    from .recsys import dense_low_rank_block

    ratings = dense_low_rank_block(spark)
    model = train_als(ratings, ALSConfig(rank=8, reg=0.05, max_iter=5, seed=42))
    users = ratings.select("user_id").where(F.col("user_id") < 20).distinct()
    recs = model.recommendForUserSubset(users, 5)
    return recs.select(
        "user_id",
        F.posexplode("recommendations").alias("rank0", "rec"),
    ).select(
        "user_id",
        (F.col("rank0") + 1).alias("rank"),
        F.col("rec.item_id").alias("item_id"),
    )


@register(
    "movielens_replay",
    None,  # iterative MLlib training — rows-only check (SURVEY.md §5 tier 2)
    tags=("M1", "M2", "S1", "S2", "S3", "U1", "U4", "ALS", "capstone"),
    description="Reference-program replay: the four-phase main() pipeline "
    "(SVDMovieLensSparkJava.java:165-182) as one lineage — deterministic 80/20 "
    "holdout on low-rank ratings, ALS with the reference hyperparameters "
    "(rank=64, reg=0.015), clamped prediction, and the 5-column predictions "
    "table of TestingData.toString() (TestingData.java:33-36): cust_id, "
    "movie_id, rating, prediction, abs_diff. Output format + MAE gate in "
    "tests/test_recsys.py.",
)
def q_movielens_replay(spark, sf_dir):
    return movielens_replay(spark, sf_dir)


@register(
    "als_replay_hash",
    # Pinned-constant oracle, legitimate because the query's input is
    # FIXTURE-FREE: dense_replay trains on the md5-derived dense low-rank
    # block (recsys.dense_low_rank_block — nothing reads sf_dir), and ALS
    # is bit-stable across session shapes (block partitioner hashes ids
    # into a FIXED block count; chaos-tested in tests/test_recsys.py under
    # local[2]/7, local[4]/8 and local[32]/32). The md5 below is therefore
    # a cross-round invariant of the engine, not of the regenerated
    # fixture — the same pinned-constant pattern as the ANN recall gates.
    "SELECT '8208acf6826274a0545a54af35e3250c' AS output_md5, "
    "CAST(1974 AS BIGINT) AS n_rows",
    tags=("M1", "M2", "ALS", "determinism"),
    description="Driver-level determinism gate for the ALS replay family: md5 over "
    "the sorted, integer-scaled 5-column output of the fixture-free dense replay "
    "(the same pipeline shape as movielens_replay, which stays rows-only because "
    "its ratings derive from the per-round-regenerated events fixture). Converts "
    "the pytest-only golden hash into an oracle-checked catalog query.",
)
def q_als_replay_hash(spark, sf_dir):
    from .recsys import dense_replay

    rep = dense_replay(spark)
    # integer-scale every float before stringification: floor(x*1e6+0.5) on
    # the already portable-rounded columns is exact, so the row string never
    # depends on float formatting
    row = F.concat_ws(
        "|",
        F.col("cust_id").cast("string"),
        F.col("movie_id").cast("string"),
        F.floor(F.col("rating") * 1e6 + 0.5).cast("long").cast("string"),
        F.floor(F.col("prediction") * 1e6 + 0.5).cast("long").cast("string"),
        F.floor(F.col("abs_diff") * 1e6 + 0.5).cast("long").cast("string"),
    )
    return rep.select(row.alias("r")).agg(
        F.md5(F.array_join(F.array_sort(F.collect_list("r")), "\n")).alias("output_md5"),
        F.count(F.lit(1)).alias("n_rows"),
    )
