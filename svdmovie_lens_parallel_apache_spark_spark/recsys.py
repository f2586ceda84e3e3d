"""Recommender core — the reference's raison d'être, Spark-first.

The reference (``SVDMovieLensSparkJava.java``) trains Funk-SVD by serial
per-rating SGD on the DRIVER (``CalcFeatures`` 409-449, marked "Cannot be
parallelized!") and only parallelises ingest + prediction. The Spark-native
engine replaces the whole mechanism with MLlib ALS (BASELINE.json north
star): the factorization itself is distributed (block-partitioned normal
equations), arbitrary non-contiguous IDs are fine, and factors stay in
DataFrames instead of driver arrays.

Parity contract (SURVEY.md §4 traps):
- training parity is METRIC-level (RMSE/MAE within tolerance) — ALS ≠ SGD;
- prediction parity is EXACT: :func:`clamped_fold_predict` reproduces the
  reference's order-dependent per-feature clamp fold
  (``SVDMovieLensSparkJava.java:499-513``) as a column expression;
- the convergence loop (min epochs + ΔRMSE < min_improvement,
  ``SVDMovieLensSparkJava.java:416-420``) maps to a driver loop around
  refits in :func:`train_until_converged`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.hashing import portable_hash64
from .functions.scalar import MAX_RATING, MIN_RATING
from .functions.vectors import clamped_fold
from .operators.stats import error_metrics
from .sources.readers import load_table

# Reference hyperparameters (SVDMovieLensSparkJava.java:38-44,122-128)
DEFAULT_RANK = 64
DEFAULT_REG = 0.015
MIN_IMPROVEMENT = 0.0001
MIN_EPOCHS = 120


@dataclass
class ALSConfig:
    rank: int = DEFAULT_RANK
    reg: float = DEFAULT_REG
    max_iter: int = 10
    seed: int = 42
    user_col: str = "user_id"
    item_col: str = "item_id"
    rating_col: str = "rating"
    nonnegative: bool = False
    implicit_prefs: bool = False
    # at scale: number of user/item blocks controls the factor-shuffle width
    num_blocks: int | None = None


def train_als(ratings: DataFrame, cfg: ALSConfig | None = None):
    """Fit ALS. ``coldStartStrategy='drop'`` mirrors the reference's
    behaviour of only predicting IDs seen in training (dense-ID arrays,
    lines 219-221 — unseen IDs would have been an array-bounds crash)."""
    from pyspark.ml.recommendation import ALS

    cfg = cfg or ALSConfig()
    als = ALS(
        rank=cfg.rank,
        regParam=cfg.reg,
        maxIter=cfg.max_iter,
        seed=cfg.seed,
        userCol=cfg.user_col,
        itemCol=cfg.item_col,
        ratingCol=cfg.rating_col,
        nonnegative=cfg.nonnegative,
        implicitPrefs=cfg.implicit_prefs,
        coldStartStrategy="drop",
    )
    if cfg.num_blocks:
        als = als.setNumUserBlocks(cfg.num_blocks).setNumItemBlocks(cfg.num_blocks)
    return als.fit(ratings)


def predict(model, test: DataFrame, clamp_output: bool = True) -> DataFrame:
    """``model.transform`` + the reference's [1,5] output clamp."""
    out = model.transform(test)
    if clamp_output:
        out = out.withColumn(
            "prediction",
            F.least(F.lit(MAX_RATING), F.greatest(F.lit(MIN_RATING), F.col("prediction"))).cast(
                "double"
            ),
        )
    return out


def evaluate(predictions: DataFrame, rating_col: str = "rating",
             pred_col: str = "prediction") -> dict[str, float]:
    """Test-set metrics, one pass (reference printed MAE at line 470 and
    per-epoch RMSE at 393)."""
    row = error_metrics(predictions, rating_col, pred_col).collect()[0]
    return {"n": row["n"], "mae": row["mae"], "rmse": row["rmse"]}


def train_until_converged(ratings: DataFrame, validation: DataFrame,
                          cfg: ALSConfig | None = None,
                          min_rounds: int = 2, max_rounds: int = 6,
                          iter_step: int = 5,
                          min_improvement: float = MIN_IMPROVEMENT):
    """Driver-side convergence loop mirroring the reference's epoch control
    (``e < MIN_EPOCHS || rmse <= rmse_last - MIN_IMPROVEMENT``, line 420):
    refit with growing maxIter until validation RMSE stops improving by
    ``min_improvement``. (PySpark ALS has no warm start, so rounds refit —
    the loop is over model capacity, not incremental epochs.)

    Returns (model, history) where history = [(max_iter, rmse), ...].
    """
    cfg = cfg or ALSConfig()
    history: list[tuple[int, float]] = []
    best_model, last_rmse = None, float("inf")
    for round_i in range(1, max_rounds + 1):
        from dataclasses import replace

        cur = replace(cfg, max_iter=round_i * iter_step)
        model = train_als(ratings, cur)
        rmse = evaluate(predict(model, validation))["rmse"]
        history.append((cur.max_iter, rmse))
        if round_i >= min_rounds and rmse > last_rmse - min_improvement:
            if rmse >= last_rmse:  # previous round was better
                return best_model, history
            return model, history
        best_model, last_rmse = model, rmse
    return best_model, history


# ---------------------------------------------------------------------------
# Exact-parity clamp-fold predictor (U2) over factor DataFrames
# ---------------------------------------------------------------------------


def clamped_fold_predict(pairs: DataFrame, user_factors: DataFrame,
                         item_factors: DataFrame) -> DataFrame:
    """Reference predictor semantics (``PredictRating``,
    ``SVDMovieLensSparkJava.java:499-513``) over distributed factor tables:

        pred = fold over features f of clamp(acc + item[f]*user[f]), acc0=1

    ``user_factors``/``item_factors``: (id, features array<double>) — e.g.
    ALS ``model.userFactors``/``itemFactors`` (cast to double), or golden
    fixtures. Factors are broadcast when small — the DataFrame form of the
    reference's broadcast-matrices-then-lookup (J3, lines 447-448).
    """
    uf = user_factors.select(F.col("id").alias("__uid"), F.col("features").alias("__ufeat"))
    itf = item_factors.select(F.col("id").alias("__iid"), F.col("features").alias("__ifeat"))
    joined = (
        pairs.join(F.broadcast(uf), pairs["user_id"] == F.col("__uid"), "inner")
        .join(F.broadcast(itf), pairs["item_id"] == F.col("__iid"), "inner")
    )
    return joined.withColumn(
        "prediction", clamped_fold(F.col("__ufeat"), F.col("__ifeat"))
    ).drop("__uid", "__iid", "__ufeat", "__ifeat")


# ---------------------------------------------------------------------------
# Deterministic synthetic ratings + golden factors (portable md5 family —
# the DuckDB oracle and NumPy tests regenerate them bit-for-bit)
# ---------------------------------------------------------------------------


def synthetic_ratings(spark: SparkSession, sf_dir: str, n_items: int = 200) -> DataFrame:
    """MovieLens-shaped ratings derived from the events fixture:
    (user_id, item_id = event_id % n_items, rating = 1 + H(event_id) % 5).
    Engine-portable and deterministic at every scale factor."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id"),
        (F.col("event_id") % n_items).alias("item_id"),
        (F.lit(1) + portable_hash64(F.col("event_id")) % 5).alias("rating"),
    )


def structured_rating(user_col, item_col, rank: int = 4, scale: float = 30.0,
                      noise: float = 1.0):
    """The low-rank generative rating EXPRESSION shared by
    :func:`low_rank_ratings` (events-derived pairs) and
    :func:`dense_low_rank_block` (dense cross):
    clamp[1,5](3 + scale·(u·v) + noise·uniform(-0.5,0.5)), all md5-keyed."""
    uvec = golden_factor_vec(user_col, "lru", rank)
    ivec = golden_factor_vec(item_col, "lri", rank)
    dot = F.aggregate(
        F.zip_with(uvec, ivec, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    key = F.concat(user_col.cast("string"), F.lit("|"), item_col.cast("string"))
    noise_c = (portable_hash64(key) % 10001).cast("double") / 10000.0 - 0.5
    return F.least(
        F.lit(float(MAX_RATING)),
        F.greatest(
            F.lit(float(MIN_RATING)),
            F.lit(3.0) + F.lit(scale) * dot + F.lit(noise) * noise_c,
        ),
    )


def dense_low_rank_block(spark: SparkSession, n_users: int = 50,
                         n_items: int = 200, rank: int = 4) -> DataFrame:
    """DENSE low-rank ratings: every (user, item) pair in the block, same
    generative structure as :func:`low_rank_ratings`. Scale-INDEPENDENT —
    a quality gate that trains on this block measures the training code,
    not the events fixture's per-user sparsity (at sf≤0.01 the events
    pairs give ~5 ratings/user, unlearnable for any per-user factor
    model)."""
    users = spark.range(n_users).select(F.col("id").cast("int").alias("user_id"))
    items = spark.range(n_items).select(F.col("id").cast("int").alias("item_id"))
    pairs = F.broadcast(users).crossJoin(items)
    rating = structured_rating(F.col("user_id"), F.col("item_id"), rank)
    return pairs.select("user_id", "item_id", rating.cast("float").alias("rating"))


def low_rank_ratings(spark: SparkSession, sf_dir: str, n_items: int = 400,
                     rank: int = 4, scale: float = 30.0,
                     noise: float = 1.0) -> DataFrame:
    """MovieLens-shaped ratings with GENUINE low-rank structure (unlike
    :func:`synthetic_ratings`, whose hash ratings are structureless):

        rating = clamp[1,5](3 + scale·(u·v) + noise·uniform(-0.5, 0.5))

    u, v are the pinned md5-derived golden factors, the noise is keyed on
    (user,item) — fully deterministic at every scale factor, distributed
    column expressions only. With the defaults the structured term has
    std ≈ 0.8 and the noise std ≈ 0.29, so a factorization model that
    recovers the rank-``rank`` structure beats the constant-mean baseline
    by ~2-3× RMSE — which makes trained-model quality MEASURABLE (the
    reference's MAE claim is over real MovieLens-100K, which also has
    learnable structure)."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", (F.col("event_id") % n_items).alias("item_id")
    ).dropDuplicates(["user_id", "item_id"])
    rating = structured_rating(F.col("user_id"), F.col("item_id"), rank, scale, noise)
    return pairs.select("user_id", "item_id", rating.alias("rating"))


def movielens_replay(spark: SparkSession, sf_dir: str,
                     cfg: ALSConfig | None = None,
                     n_items: int = 400) -> DataFrame:
    """End-to-end replay of the reference PROGRAM — the four-phase
    ``main()`` pipeline (``SVDMovieLensSparkJava.java:165-182``): ingest
    ratings → train the factorization → predict the held-out set → emit
    the reference's 5-column predictions table
    (``TestingData.toString()``, ``TestingData.java:33-36``):

        cust_id, movie_id, rating, prediction, abs_diff

    Differences by design: the train/test split is a deterministic 80/20
    hash holdout (the reference ships pre-split u1.base/u1.test files),
    and training is distributed MLlib ALS with the reference's
    hyperparameters (rank=64, reg=0.015) instead of driver-serial SGD.
    Write with ``sources.writers.write_tsv`` for the exact TSV sink shape
    (S3)."""
    ratings = low_rank_ratings(spark, sf_dir, n_items=n_items).select(
        F.col("user_id").cast("int").alias("user_id"),
        F.col("item_id").cast("int").alias("item_id"),
        F.col("rating").cast("float").alias("rating"),
    )
    return _replay_from_ratings(ratings, cfg or ALSConfig())


def _replay_from_ratings(ratings: DataFrame, cfg: ALSConfig) -> DataFrame:
    """Shared four-phase tail: deterministic 80/20 hash holdout → ALS →
    clamped predict → the reference's 5-column predictions table."""
    split_key = F.concat(
        F.col("user_id").cast("string"), F.lit("|"), F.col("item_id").cast("string"),
        F.lit("|split"),
    )
    is_test = portable_hash64(split_key) % 10 >= 8
    train = ratings.where(~is_test)
    test = ratings.where(is_test)
    model = train_als(train, cfg)
    preds = predict(model, test)
    from .functions.scalar import portable_round as _pr

    return preds.select(
        F.col("user_id").alias("cust_id"),
        F.col("item_id").alias("movie_id"),
        F.col("rating").cast("double").alias("rating"),
        _pr(F.col("prediction"), 6).alias("prediction"),
        _pr(F.abs(F.col("rating").cast("double") - F.col("prediction")), 6).alias("abs_diff"),
    )


def dense_replay(spark: SparkSession, cfg: ALSConfig | None = None,
                 n_users: int = 50, n_items: int = 200) -> DataFrame:
    """The replay pipeline over the FIXTURE-FREE dense low-rank block —
    every input is md5-derived from (n_users, n_items), nothing reads
    testdata. Exists so a golden-hash determinism gate can pin the full
    four-phase output bit-exactly across rounds: the driver fixture is
    regenerated between rounds (so pinning ``movielens_replay``'s hash
    would false-fail), but this block never changes. ALS itself is
    bit-stable across thread counts / shuffle-partition counts (its block
    partitioner keys on id hash with a FIXED block count, not on
    parallelism) — verified by ``tests/test_recsys.py``'s golden-hash test
    running under two different session shapes."""
    ratings = dense_low_rank_block(spark, n_users=n_users, n_items=n_items)
    return _replay_from_ratings(ratings, cfg or ALSConfig(rank=8, max_iter=5))


def golden_factor_vec(id_col, kind: str, rank: int = 8):
    """Pinned pseudo-random factor vector: component i =
    H('{kind}|{id}|{i}') / 2^32 * 0.4 - 0.2. Column expression; NumPy and
    DuckDB twins produce identical doubles (division by 2^32 is exact)."""
    def comp(i):
        key = F.concat(
            F.lit(f"{kind}|"), id_col.cast("string"), F.lit("|"), i.cast("string")
        )
        return portable_hash64(key).cast("double") / F.lit(4294967296.0) * 0.4 - 0.2

    return F.transform(F.sequence(F.lit(1), F.lit(rank)), comp)
