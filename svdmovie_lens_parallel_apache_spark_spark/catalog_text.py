"""Catalog part 2: text analysis, dedup, similarity-search queries.

Every query here is the Spark-first implementation of a training-data
pipeline op (BASELINE.json north star), and — because all hashing goes
through the portable md5 family (functions/hashing.py) and all float
reductions are sequential folds — each has an exact DuckDB oracle that
replays the SAME algorithm (signatures, bands, buckets, folds)
bit-for-bit. The oracle checks the distributed implementation against a
single-node replay, which is precisely the correctness question for
these operators.

SQL-building helpers below generate the repetitive parts (per-salt
minhash columns, per-bit simhash votes, per-plane LSH bits).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import _R, _t, register
from .functions.hashing import oracle_hash_sql
from .functions.scalar import portable_round as _r
from .operators.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    minhash_dedup_pairs,
    mllib_minhash_pairs,
    simhash_pairs,
)
from .operators.similarity import (
    embedding_norm_stats,
    knn_brute_force,
    knn_lsh,
    lsh_buckets,
    mllib_brp_knn,
)
from .operators.textops import (
    fingerprints,
    lang_id_heuristic,
    term_frequency,
    text_stats,
)

# ---------------------------------------------------------------------------
# DuckDB SQL fragments (twins of functions/hashing.py + functions/text.py)
# ---------------------------------------------------------------------------

# tokens of (already lowercased/trimmed handled by caller)
_TOKS = "list_filter(string_split(trim({src}), ' '), x -> x <> '')"


def _H(expr: str) -> str:
    """portable_hash64 twin."""
    return f"CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, 8)) AS BIGINT)"


def _HS(expr: str, salt: int) -> str:
    """shingle_hash twin."""
    return _H(f"concat('{salt}|', {expr})")


_SHINGLES = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(toks) - 2, 0)), "
    "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))"
)

_JACCARD = (
    "len(list_intersect({a}, {b})) * 1.0 / "
    "(len({a}) + len({b}) - len(list_intersect({a}, {b})))"
)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


_MEAN_TOK_LEN = r"length(regexp_replace(trim(text), '\s+', '', 'g')) * 1.0 / len(toks)"
_STOPWORD_RATIO = (
    "len(list_filter(ltoks, t -> t IN ('the','a','and','of','to','in','is','it',"
    "'that','for'))) * 1.0 / len(ltoks)"
)
_PUNCT_RATIO = (
    "CASE WHEN length(text) = 0 THEN 0.0 ELSE "
    "length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) * 1.0 / length(text) END"
)


@register(
    "text_stats",
    f"""
    WITH t AS (
      SELECT doc_id, lang, source, text,
             {_TOKS.format(src='text')} AS toks,
             {_TOKS.format(src='lower(text)')} AS ltoks
      FROM documents)
    SELECT doc_id, lang, source,
           CAST(len(toks) AS INTEGER)                 AS n_tokens,
           CAST(len(list_distinct(toks)) AS INTEGER)  AS n_types,
           {_R('len(list_distinct(toks)) * 1.0 / len(toks)', 6)} AS type_token_ratio,
           {_R(_MEAN_TOK_LEN, 6)} AS mean_token_len,
           {_R(_STOPWORD_RATIO, 6)} AS stopword_ratio,
           {_R(_PUNCT_RATIO, 6)} AS punct_ratio
    FROM t
    """,
    tags=("text", "quality"),
    description="Per-document quality metrics (token counts, TTR, mean token length, "
    "stopword/punct ratios) — C4/Gopher-style filter signals.",
)
def q_text_stats(spark, sf_dir):
    return text_stats(_t(spark, sf_dir, "documents"))


@register(
    "lang_id_heuristic",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             {_TOKS.format(src='lower(text)')} AS ltoks
      FROM documents),
    r AS (
      SELECT doc_id, lang,
             CASE WHEN len(ltoks) = 0 THEN 0.0
                  ELSE len(list_filter(ltoks, t -> t IN ('the','a','and','of','to','in','is','it','that','for'))) * 1.0 / len(ltoks)
             END AS ratio
      FROM t)
    SELECT doc_id, lang,
           {_R('ratio', 6)} AS en_signal,
           CASE WHEN ratio >= 0.05 THEN 'en' ELSE 'other' END AS pred_lang
    FROM r
    """,
    tags=("text", "lang-id"),
    description="Stopword-density language-ID heuristic vs fixture ground truth.",
)
def q_lang_id(spark, sf_dir):
    return lang_id_heuristic(_t(spark, sf_dir, "documents"), en_threshold=0.05)


@register(
    "doc_fingerprints",
    f"""
    SELECT doc_id,
           md5(lower(trim(text)))            AS fp_md5,
           {_H('lower(trim(text))')}         AS fp64,
           CAST(length(text) AS INTEGER)     AS n_chars_actual
    FROM documents
    """,
    tags=("text", "fingerprint"),
    description="Canonicalised content fingerprints (md5 + portable 32-bit).",
)
def q_doc_fingerprints(spark, sf_dir):
    return fingerprints(_t(spark, sf_dir, "documents"))


@register(
    "term_frequency",
    """
    SELECT term, count(*) AS term_count
    FROM (
      SELECT unnest(list_filter(string_split(trim(lower(text)), ' '), x -> x <> '')) AS term
      FROM documents)
    GROUP BY term
    ORDER BY term_count DESC, term
    LIMIT 25
    """,
    tags=("text", "tf"),
    description="Corpus term frequency top-25 (explode → hash agg → ordered limit).",
)
def q_term_frequency(spark, sf_dir):
    return term_frequency(_t(spark, sf_dir, "documents"), top_n=25)


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT md5(lower(trim(text))) AS fp_md5,
           min(doc_id)            AS keep_doc_id,
           count(*)               AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup",),
    description="Exact dedup groups: hash-groupBy on canonical digest, keep min id.",
)
def q_dedup_exact(spark, sf_dir):
    return exact_dedup_groups(_t(spark, sf_dir, "documents"))


# Stop-shingle document-frequency cap mirrored by the Spark operator
# (operators/dedup.py::jaccard_pairs max_df default) — the oracle replays
# the SAME capped posting-list algorithm, so semantics match at any df.
_JACCARD_MAX_DF = 1000

# Shared CTE chain: tokens → distinct shingles → posting lists → df cap →
# pairwise intersection counts → rounded Jaccard. Used by the pairs query
# and (under WITH RECURSIVE) by the clusters / pipeline capstones.
_JACCARD_CTES = f"""jt AS (
      SELECT doc_id, lang, {_TOKS.format(src='lower(text)')} AS toks FROM documents),
    jsh AS (SELECT doc_id, lang, {_SHINGLES} AS sh FROM jt),
    jposts AS (SELECT lang, doc_id, len(sh) AS sz, unnest(sh) AS shingle FROM jsh),
    jkept AS (
      SELECT lang, doc_id, sz, shingle FROM (
        SELECT lang, doc_id, sz, shingle,
               count(*) OVER (PARTITION BY lang, shingle) AS df
        FROM jposts)
      WHERE df <= {_JACCARD_MAX_DF}),
    jinter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sz AS sz_a, b.sz AS sz_b,
             count(*) AS isect
      FROM jkept a JOIN jkept b
        ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    jpairs AS (
      SELECT doc_a, doc_b,
             {_R('isect * 1.0 / (sz_a + sz_b - isect)', 6)} AS jaccard
      FROM jinter)"""


@register(
    "dedup_jaccard_pairs",
    f"""
    WITH {_JACCARD_CTES}
    SELECT doc_a, doc_b, jaccard FROM jpairs WHERE jaccard >= 0.5
    """,
    tags=("dedup", "jaccard"),
    description="Exact 3-gram-shingle Jaccard near-dup pairs within language blocks "
    "via inverted-index posting lists with a stop-shingle df cap (max_df=1000) — "
    "the exact baseline the MinHash variant is verified against. The oracle replays "
    "the identical capped posting-list algorithm.",
)
def q_dedup_jaccard(spark, sf_dir):
    return jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5, n=3, block_col="lang")


@register(
    "dup_ngram_fraction",
    f"""
    WITH t AS (
      SELECT doc_id, {_TOKS.format(src='lower(text)')} AS toks FROM documents),
    s AS (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                            i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) AS sh
      FROM t),
    m AS (
      SELECT doc_id,
             CAST(len(sh) AS BIGINT)                AS n_ngrams,
             CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct,
             {_R("CASE WHEN len(sh) = 0 THEN 0.0 ELSE 1.0 - len(list_distinct(sh)) * 1.0 / len(sh) END", 6)} AS dup_frac
      FROM s)
    SELECT doc_id, n_ngrams, n_distinct, dup_frac, dup_frac > 0.1 AS flagged
    FROM m
    """,
    tags=("quality", "repetition", "ngram", "pipeline"),
    description="Gopher/RefinedWeb-style intra-document repetition filter: fraction "
    "of POSITIONAL 3-gram shingles that are duplicates (1 - distinct/total) per doc, "
    "with a >0.1 flag. Complements repetition_ratio (top-token share): this catches "
    "looping/boilerplate spans rather than single-token spam. Pure JVM HOF exprs; "
    "the flag compares the PORTABLY-ROUNDED fraction so the boolean is "
    "boundary-stable across engines.",
)
def q_dup_ngram_fraction(spark, sf_dir):
    from .functions.text import positional_shingles, tokens

    docs = _t(spark, sf_dir, "documents")
    b = docs.select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("toks")
    ).select("doc_id", positional_shingles(F.col("toks"), 3).alias("sh"))
    n_all = F.size("sh").cast("bigint")
    n_dis = F.size(F.array_distinct("sh")).cast("bigint")
    frac = _r(
        F.when(n_all == 0, F.lit(0.0)).otherwise(
            F.lit(1.0) - n_dis.cast("double") / n_all.cast("double")
        ),
        6,
    )
    m = b.select(
        "doc_id",
        n_all.alias("n_ngrams"),
        n_dis.alias("n_distinct"),
        frac.alias("dup_frac"),
    )
    return m.withColumn("flagged", F.col("dup_frac") > 0.1)


@register(
    "source_mixture_sample",
    f"""
    WITH t AS (
      SELECT source, len({_TOKS.format(src='text')}) AS ntok FROM documents),
    a AS (
      SELECT source, count(*) AS n_docs, sum(ntok) AS n_tokens
      FROM t GROUP BY source),
    w AS (SELECT *, sqrt(CAST(n_tokens AS DOUBLE)) AS w_raw FROM a)
    SELECT source,
           CAST(n_docs AS BIGINT)   AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           {_R('w_raw / sum(w_raw) OVER ()', 6)} AS weight,
           CAST(floor((0.5 * (sum(n_docs) OVER ())) * (w_raw / sum(w_raw) OVER ()))
                AS BIGINT) AS quota
    FROM w
    """,
    tags=("sampling", "mixture", "pipeline"),
    description="LLaMA-style temperature mixture weights across sources: per-source "
    "token mass raised to alpha=0.5 (sqrt), normalised into sampling weights, then "
    "doc quotas for a 50%-of-corpus budget. Upweights small sources / downweights "
    "dominant ones — the data-mixing step before training. One groupBy + one tiny "
    "all-rows window (cardinality = #sources, inherently small); per-doc selection "
    "against the quota is the deterministic-hash top-k already proven by "
    "stratified_sample_quota.",
)
def q_source_mixture_sample(spark, sf_dir):
    from pyspark.sql import Window

    from .functions.text import token_count

    docs = _t(spark, sf_dir, "documents")
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    w_raw = F.sqrt(F.col("n_tokens").cast("double"))
    weight = w_raw / F.sum(w_raw).over(w_all)
    total_docs = F.sum("n_docs").over(w_all)
    return agg.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        _r(weight, 6).alias("weight"),
        # association order pinned to the oracle's: (0.5*total) * (w_raw/sum)
        # — floor() can flip by 1 at near-integer boundaries if the doubles
        # are produced in a different order
        F.floor((F.lit(0.5) * total_docs) * weight).cast("bigint").alias("quota"),
    )


@register(
    "benchmark_decontamination",
    f"""
    WITH t AS (
      SELECT doc_id, {_TOKS.format(src='lower(text)')} AS toks FROM documents),
    s AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
    posts AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
    kept AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle,
               count(*) OVER (PARTITION BY shingle) AS df
        FROM posts)
      WHERE df <= {_JACCARD_MAX_DF}),
    bench AS (
      SELECT doc_id AS bench_doc_id, shingle FROM kept
      WHERE {_H('doc_id')} % 20 = 0),
    corpus AS (
      SELECT doc_id AS corpus_doc_id, shingle FROM kept
      WHERE {_H('doc_id')} % 20 <> 0)
    SELECT corpus_doc_id, bench_doc_id, count(*) AS n_shared
    FROM corpus JOIN bench USING (shingle)
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
    tags=("dedup", "decontamination", "ngram", "pipeline"),
    description="Benchmark decontamination (GPT-3/LLaMA-style): training docs "
    "sharing >=2 distinct 3-gram shingles with a benchmark set (deterministic "
    "5% hash slice standing in for a loaded eval suite). Posting-list equi-join "
    "with stop-shingle df cap; bench side broadcast — corpus never shuffles. "
    "Distinct from dedup: cross-corpus, any-collision signal, not Jaccard.",
)
def q_benchmark_decontamination(spark, sf_dir):
    from .functions.hashing import portable_hash64
    from .operators.dedup import ngram_collision_pairs

    docs = _t(spark, sf_dir, "documents")
    return ngram_collision_pairs(
        docs,
        bench_cond=portable_hash64(F.col("doc_id")) % 20 == 0,
        n=3,
        min_shared=2,
        max_df=_JACCARD_MAX_DF,
    )


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_JACCARD_CTES},
    p AS (SELECT doc_a, doc_b FROM jpairs WHERE jaccard >= 0.5),
    e(src, dst) AS (
      SELECT doc_a, doc_b FROM p
      UNION ALL
      SELECT doc_b, doc_a FROM p
    ),
    r(node, lbl) AS (
      SELECT DISTINCT src, src FROM e
      UNION
      SELECT e.dst, r.lbl FROM r JOIN e ON e.src = r.node
    )
    SELECT node AS doc_id, min(lbl) AS cluster_id FROM r GROUP BY node
    """,
    tags=("dedup", "clusters", "iterative", "graph"),
    description="Connected components over Jaccard≥0.5 near-dup pairs (min-label "
    "propagation to fixpoint — the iterative-DataFrame pattern). Oracle: recursive CTE "
    "transitive closure; completes the dedup pipeline pairs → groups → keep-one.",
)
def q_dedup_clusters(spark, sf_dir):
    from .operators.dedup import dedup_clusters

    pairs = jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5, n=3, block_col="lang")
    return dedup_clusters(pairs)


@register(
    "pipeline_e2e",
    f"""
    WITH RECURSIVE {_JACCARD_CTES},
    p AS (SELECT doc_a, doc_b FROM jpairs WHERE jaccard >= 0.5),
    e(src, dst) AS (
      SELECT doc_a, doc_b FROM p UNION ALL SELECT doc_b, doc_a FROM p),
    r(node, lbl) AS (
      SELECT DISTINCT src, src FROM e
      UNION
      SELECT e.dst, r.lbl FROM r JOIN e ON e.src = r.node),
    clusters AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM r GROUP BY node),
    quality AS (
      SELECT d.doc_id, d.lang,
             coalesce(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
      WHERE len({_TOKS.format(src='d.text')}) >= 20),
    keep AS (
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY cluster_id ORDER BY doc_id) AS rn
        FROM quality)
      WHERE rn = 1),
    sampled AS (
      SELECT doc_id, lang FROM keep
      WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 50)
    SELECT lang, count(*) AS n_docs FROM sampled GROUP BY lang
    """,
    tags=("pipeline", "capstone", "dedup", "quality", "sampling"),
    description="End-to-end training-data pipeline: quality gate (≥20 tokens) → "
    "near-dup CLUSTER dedup keep-lowest-id → deterministic 50% hash sample → per-lang "
    "counts. Composes quality/clusters/sampling operators in one lineage; the oracle "
    "replays the full chain (incl. the recursive-CTE closure).",
)
def q_pipeline_e2e(spark, sf_dir):
    from pyspark.sql import Window

    from .functions.hashing import portable_hash64
    from .functions.text import token_count
    from .operators.dedup import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.5, n=3, block_col="lang")
    clusters = dedup_clusters(pairs)
    quality = (
        docs.where(token_count(F.col("text")) >= 20)
        .join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id")))
    )
    w = Window.partitionBy("cluster_id").orderBy("doc_id")
    keep = quality.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    sampled = keep.where(portable_hash64(F.col("doc_id")) % 100 < 50)
    return sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


def _minhash_oracle(k: int = 8, band_size: int = 2, threshold: float = 0.5) -> str:
    from .operators.dedup import P31, minhash_mix_params

    sig_cols = ",\n             ".join(
        "list_aggregate(list_transform(hs, h -> (h * {a} + {b}) % {p}), 'min') AS mh{salt}".format(
            a=minhash_mix_params(salt)[0], b=minhash_mix_params(salt)[1], p=P31, salt=salt
        )
        for salt in range(k)
    )
    n_bands = k // band_size
    band_exprs = ", ".join(
        "concat('b{b}', {parts})".format(
            b=b,
            parts=", ".join(f"'_', mh{b * band_size + j}" for j in range(band_size)),
        )
        for b in range(n_bands)
    )
    return f"""
    WITH s AS (
      SELECT doc_id, list_distinct(list_transform(sh, s -> {_H('s')} % {P31})) AS hs
      FROM (SELECT doc_id, {_SHINGLES} AS sh
            FROM (SELECT doc_id, {_TOKS.format(src='lower(text)')} AS toks
                  FROM documents))),
    sig AS (
      SELECT doc_id, hs,
             {sig_cols}
      FROM s),
    banded AS (
      SELECT doc_id, unnest([{band_exprs}]) AS band_key FROM sig),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM banded x JOIN banded y
        ON x.band_key = y.band_key AND x.doc_id < y.doc_id)
    SELECT * FROM (
      SELECT c.doc_a, c.doc_b,
             {_R(_JACCARD.format(a='a.hs', b='b.hs'), 6)} AS jaccard
      FROM cand c
      JOIN sig a ON c.doc_a = a.doc_id
      JOIN sig b ON c.doc_b = b.doc_id)
    WHERE jaccard >= {threshold}
    """


@register(
    "dedup_minhash",
    _minhash_oracle(k=8, band_size=2, threshold=0.5),
    tags=("dedup", "minhash", "lsh"),
    description="MinHash(k=8) + LSH banding (4 bands × 2) → candidate equi-join → exact "
    "Jaccard verify. The 100 TB near-dup path: no all-pairs comparison; the oracle "
    "replays the identical signature/band/verify pipeline single-node.",
)
def q_dedup_minhash(spark, sf_dir):
    return minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), k=8, band_size=2, threshold=0.5, n=3
    )


def _simhash_oracle(bits: int = 32, max_hamming: int = 3) -> str:
    from .functions.hashing import oracle_hash_wide_sql

    hash_bits = min(60, ((bits + 3) // 4) * 4)
    vote_terms = " + ".join(
        f"CASE WHEN list_sum(list_transform(hs, h -> ((h >> {j}) & 1) * 2 - 1)) > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for j in range(bits)
    )
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_transform(list_distinct({_TOKS.format(src='lower(text)')}),
                            t -> {oracle_hash_wide_sql('t', hash_bits)}) AS hs
      FROM documents),
    sig AS (
      SELECT doc_id, {vote_terms} AS simhash FROM t)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


@register(
    "dedup_simhash",
    _simhash_oracle(bits=48, max_hamming=3),
    tags=("dedup", "simhash"),
    description="48-bit SimHash near-dup pairs (Hamming ≤ 3) via pigeonhole chunk "
    "blocking: per-bit majority-vote signature, explode into 4 disjoint 12-bit "
    "chunks, equi-join on (chunk_idx, chunk_val), exact bit_count(xor) verify. "
    "48-bit signatures keep chunk buckets at 4096 values (vs 256 for 32-bit) — "
    "bucket occupancy, and so candidate volume, stays sub-quadratic at corpus "
    "scale. Oracle replays the identical signature + Hamming filter.",
)
def q_dedup_simhash(spark, sf_dir):
    out = simhash_pairs(_t(spark, sf_dir, "documents"), max_hamming=3, bits=48)
    return out.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_VEC = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_FOLD_DOT = (
    "list_reduce(list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i]), "
    "(x, y) -> x + y)"
)
_FOLD_NORM = "sqrt(list_reduce(list_transform({v}, x -> x * x), (a, b) -> a + b))"


@register(
    "knn_brute_cosine",
    f"""
    WITH v AS (SELECT vec_id, {_VEC} AS vec FROM embeddings),
    n AS (SELECT vec_id, vec, {_FOLD_NORM.format(v='vec')} AS nrm FROM v),
    p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_FOLD_DOT.format(a='q.vec', b='c.vec')} / (q.nrm * c.nrm) AS cos_raw
      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
           {_R('cos_raw', 6)} AS cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_raw DESC, neighbor_id) AS rank
          FROM p)
    WHERE rank <= 5
    """,
    tags=("similarity", "knn"),
    description="Exact cosine top-5 for 10 query vectors: broadcast queries × corpus, "
    "sequential-fold dot/norm (bit-reproducible), per-query window top-k.",
)
def q_knn_brute(spark, sf_dir):
    return knn_brute_force(_t(spark, sf_dir, "embeddings"), query_ids_below=10, k=5)


def _hp_sql(j: int) -> str:
    h = _H(f"concat('hp|{j}|', CAST(i AS VARCHAR))")
    return f"(CAST({h} AS DOUBLE) / 4294967296.0 - 0.5)"


def _lsh_bucket_oracle(n_planes: int) -> str:
    bits = " + ".join(
        f"CASE WHEN list_reduce(list_transform(generate_series(1, len(vec)), "
        f"i -> vec[i] * {_hp_sql(j)}), (a, b) -> a + b) > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for j in range(n_planes)
    )
    return f"""
    WITH v AS (SELECT vec_id, {_VEC} AS vec FROM embeddings)
    SELECT vec_id, {bits} AS bucket FROM v
    """


@register(
    "ann_lsh_buckets",
    _lsh_bucket_oracle(16),
    tags=("similarity", "lsh"),
    description="Sign-random-projection LSH bucketing (16 md5-derived hyperplanes): the "
    "scale path for ANN — neighbor search becomes an equi-join on bucket.",
)
def q_lsh_buckets(spark, sf_dir):
    return lsh_buckets(_t(spark, sf_dir, "embeddings"), dim=64, n_planes=16)


# Derived from the fixture, not pinned: testdata is regenerated between
# driver rounds, so a hard-coded (10, 50) would false-fail if a regenerated
# embeddings table ever shipped fewer than 10 low-id vectors (or < 6 rows).
# n_queries = vectors with vec_id < 10; each query's brute top-k has
# min(k, corpus-1) neighbors. recall_ok stays the only engine-coupled bit.
_ANN_GATE_ORACLE = """
    SELECT CAST(count(*) FILTER (WHERE vec_id < 10) AS BIGINT) AS n_queries,
           CAST(5 AS INTEGER) AS k,
           CAST(count(*) FILTER (WHERE vec_id < 10)
                * least(5, count(*) - 1) AS BIGINT) AS n_brute_pairs,
           TRUE AS recall_ok
    FROM embeddings
"""


@register(
    "ann_lsh_knn",
    _ANN_GATE_ORACLE,
    tags=("similarity", "lsh", "knn"),
    description="ANN top-5 within LSH buckets (4 planes × 8 OR-amplified tables), folded "
    "into an oracle-able recall gate: the brute-force ground truth is computed in-engine "
    "and recall_ok pins recall ≥ 0.5 (measured 0.72@sf0.001 / 0.60@sf0.01) — a recall "
    "collapse fails the driver hash gate. Neighbor-list recall also asserted in "
    "tests/test_pipeline_ops.py.",
)
def q_lsh_knn(spark, sf_dir):
    from .operators.similarity import ann_recall_gate

    emb = _t(spark, sf_dir, "embeddings")
    approx = knn_lsh(emb, query_ids_below=10, k=5, n_planes=4, n_tables=8)
    return ann_recall_gate(emb, approx, query_ids_below=10, k=5, floor=0.5)


@register(
    "dedup_minhash_mllib",
    f"""
    WITH {_JACCARD_CTES}
    SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs, TRUE AS all_exact_found
    FROM jpairs WHERE jaccard >= 0.95
    """,
    tags=("dedup", "minhash", "mllib"),
    description="MLlib MinHashLSH near-dup variant (HashingTF sparse vectors + "
    "approxSimilarityJoin at Jaccard distance 0.5), folded into an oracle-able "
    "containment gate: every exact same-lang Jaccard≥0.95 pair (DuckDB-computable "
    "ground truth) must appear in the MLlib result — all_exact_found pinned TRUE, "
    "so an LSH recall collapse fails the driver hash gate. Portable twin with full "
    "pair output: dedup_minhash.",
)
def q_dedup_minhash_mllib(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    exact = jaccard_pairs(docs, threshold=0.95, n=3, block_col="lang").select(
        "doc_a", "doc_b"
    )
    mllib = mllib_minhash_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    missed = exact.join(mllib, ["doc_a", "doc_b"], "left_anti")
    return exact.agg(F.count(F.lit(1)).alias("n_exact_pairs")).crossJoin(
        missed.agg((F.count(F.lit(1)) == 0).alias("all_exact_found"))
    )


@register(
    "knn_brute_l2",
    f"""
    WITH v AS (SELECT vec_id, {_VEC} AS vec FROM embeddings),
    p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce(list_transform(generate_series(1, len(q.vec)),
                                        i -> (q.vec[i] - c.vec[i]) * (q.vec[i] - c.vec[i])),
                         (x, y) -> x + y) AS d2_raw
      FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
           {_R('d2_raw', 6)} AS sq_dist
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY d2_raw ASC, neighbor_id) AS rank
          FROM p)
    WHERE rank <= 5
    """,
    tags=("similarity", "knn", "euclidean"),
    description="Exact Euclidean top-5 (squared-distance ordering) for 10 query "
    "vectors: broadcast queries × corpus, sequential-fold sum of squared diffs, "
    "per-query window top-k — the exact ground truth for the Euclidean-metric "
    "MLlib BRP variant, next to the cosine brute baseline.",
)
def q_knn_brute_l2(spark, sf_dir):
    from .operators.similarity import knn_brute_force_l2

    return knn_brute_force_l2(_t(spark, sf_dir, "embeddings"), query_ids_below=10, k=5)


@register(
    "ann_brp_knn_mllib",
    _ANN_GATE_ORACLE,
    tags=("similarity", "lsh", "mllib"),
    description="MLlib BucketedRandomProjectionLSH ANN top-5 (Euclidean), folded "
    "into an oracle-able recall gate against the exact Euclidean brute force "
    "(knn_brute_l2 — the metric-correct ground truth): recall_ok pins recall ≥ 0.8 "
    "(measured 0.92@sf0.001 / 0.94@sf0.01); collapse fails the driver hash gate.",
)
def q_ann_brp_mllib(spark, sf_dir):
    from .operators.similarity import ann_recall_gate, knn_brute_force_l2

    emb = _t(spark, sf_dir, "embeddings")
    approx = mllib_brp_knn(emb, query_ids_below=10, k=5)
    return ann_recall_gate(
        emb, approx, query_ids_below=10, k=5, floor=0.8,
        brute=knn_brute_force_l2(emb, query_ids_below=10, k=5),
    )


_LSH_BASE, _LSH_TARGET, _LSH_CAP = 4, 32, 24


def _cosine_pairs_ctes(threshold: float = 0.4) -> str:
    """Shared CTE chain: vectors → SCALE-ADAPTIVE sign-LSH buckets →
    bucket-blocked pairs with exact cosine ≥ threshold (cpairs). Used by
    the pairs query and, under WITH RECURSIVE, by the embedding clusters
    capstone. The plane count replays
    :func:`~.operators.similarity.adaptive_n_planes` with integer-only
    threshold sums (``4 + Σ [count > 32·2^k]``), so the oracle picks the
    SAME np the Spark side does at any corpus size; plane ``j``
    participates in the bucket only when ``j < np``."""
    np_terms = " + ".join(
        f"(CASE WHEN cnt > {_LSH_TARGET << k} THEN 1 ELSE 0 END)"
        for k in range(_LSH_BASE, _LSH_CAP)
    )
    bits = " + ".join(
        f"CASE WHEN {j} < (SELECT np FROM params) AND "
        f"list_reduce(list_transform(generate_series(1, len(vec)), "
        f"i -> vec[i] * {_hp_sql(j)}), (a, b) -> a + b) > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for j in range(_LSH_CAP)
    )
    return f"""params AS (
      SELECT {_LSH_BASE} + {np_terms} AS np
      FROM (SELECT count(*) AS cnt FROM embeddings)),
    v AS (SELECT vec_id, {_VEC} AS vec FROM embeddings),
    n AS (SELECT vec_id, vec, {_FOLD_NORM.format(v='vec')} AS nrm,
                 {bits} AS bucket
          FROM v),
    cpairs AS (
      SELECT * FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_R(_FOLD_DOT.format(a='a.vec', b='b.vec') + " / (a.nrm * b.nrm)", 6)} AS cosine
        FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
      WHERE cosine >= {threshold})"""


def _cosine_dedup_oracle(threshold: float = 0.4) -> str:
    return f"""
    WITH {_cosine_pairs_ctes(threshold)}
    SELECT vec_a, vec_b, cosine FROM cpairs
    """


@register(
    "dedup_embedding_cosine",
    _cosine_dedup_oracle(0.4),
    tags=("dedup", "similarity", "embedding", "lsh"),
    description="Embedding-cosine near-dup pairs, LSH-bucket-blocked with a "
    "SCALE-ADAPTIVE plane count (np = adaptive_n_planes(N): smallest np >= 4 with "
    "N <= 32·2^np, so buckets ∝ N and candidates stay ~linear; fixed np measured "
    "exp 1.33 across sf1->sf10) → equi-join on bucket → exact cosine verify, "
    "cos ≥ 0.4. The count that sizes np is parquet-metadata-weight; the oracle "
    "replays the identical np choice, bucketing, and fold.",
)
def q_dedup_embedding_cosine(spark, sf_dir):
    from .functions.vectors import cosine_similarity, to_double
    from .operators.similarity import (
        adaptive_n_planes,
        lsh_bucket,
        lsh_hyperplanes,
    )

    emb = _t(spark, sf_dir, "embeddings")
    np_ = adaptive_n_planes(
        emb.count(), base=_LSH_BASE, target=_LSH_TARGET, cap=_LSH_CAP
    )
    planes = lsh_hyperplanes(64, np_, tag="hp")
    base = emb.select(
        "vec_id",
        to_double(F.col("embedding")).alias("vec"),
    ).withColumn("bucket", lsh_bucket(F.col("vec"), planes))
    a = base.select("bucket", F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"))
    b = base.select("bucket", F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"))
    return (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            _r(cosine_similarity(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.4)
    )


@register(
    "embedding_dedup_clusters",
    f"""
    WITH RECURSIVE {_cosine_pairs_ctes(0.4)},
    e(src, dst) AS (
      SELECT vec_a, vec_b FROM cpairs
      UNION ALL
      SELECT vec_b, vec_a FROM cpairs
    ),
    r(node, lbl) AS (
      SELECT DISTINCT src, src FROM e
      UNION
      SELECT e.dst, r.lbl FROM r JOIN e ON e.src = r.node
    )
    SELECT node AS vec_id, min(lbl) AS cluster_id FROM r GROUP BY node
    """,
    tags=("dedup", "similarity", "embedding", "clusters", "graph"),
    description="Embedding near-dup CLUSTERS: connected components over the "
    "LSH-blocked cosine>=0.4 pairs (same min-label closure as dedup_clusters) — "
    "completes the embedding-dedup path pairs -> groups -> keep-one, the "
    "semantic-dedup counterpart of the shingle pipeline. Oracle: recursive-CTE "
    "transitive closure over the replayed bucketing.",
)
def q_embedding_dedup_clusters(spark, sf_dir):
    from .operators.dedup import dedup_clusters

    pairs = q_dedup_embedding_cosine(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return dedup_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


@register(
    "deterministic_sample",
    f"""
    SELECT source,
           count(*)                                        AS n_total,
           count(*) FILTER (WHERE {_H('doc_id')} % 100 < 10) AS n_sampled
    FROM documents
    GROUP BY source
    """,
    tags=("sampling", "pipeline"),
    description="Deterministic 10% Bernoulli sample via the portable hash (H(id)%100<10) "
    "— reproducible across runs/engines/retries, unlike rand()-based sampling; the "
    "training-data staple for stable held-out splits.",
)
def q_deterministic_sample(spark, sf_dir):
    from .functions.hashing import portable_hash64

    docs = _t(spark, sf_dir, "documents")
    sampled = (portable_hash64(F.col("doc_id")) % 100 < 10).cast("long")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(sampled).alias("n_sampled"),
    )


@register(
    "ann_ivf_knn",
    _ANN_GATE_ORACLE,
    tags=("similarity", "ivf", "knn", "ml"),
    description="IVF-style ANN top-5: KMeans cells (inverted file) + 4-probe search + "
    "exact cosine re-rank — the clustering-based scale path next to the hash-based LSH "
    "variants — folded into an oracle-able recall gate: recall_ok pins recall ≥ 0.45 "
    "(measured 0.68@sf0.001 / 0.56@sf0.01); collapse fails the driver hash gate.",
)
def q_ann_ivf(spark, sf_dir):
    from .operators.similarity import ann_recall_gate, knn_ivf

    emb = _t(spark, sf_dir, "embeddings")
    approx = knn_ivf(emb, query_ids_below=10, k=5)
    return ann_recall_gate(emb, approx, query_ids_below=10, k=5, floor=0.45)


@register(
    "embedding_norm_stats",
    f"""
    WITH n AS (SELECT label, {_FOLD_NORM.format(v=_VEC)} AS norm FROM embeddings)
    SELECT label,
           count(*)              AS n_vecs,
           {_R('avg(norm)', 6)}  AS avg_norm,
           {_R('min(norm)', 6)}  AS min_norm,
           {_R('max(norm)', 6)}  AS max_norm
    FROM n GROUP BY label
    """,
    tags=("similarity", "array"),
    description="Per-label embedding L2-norm stats (array math smoke).",
)
def q_embedding_norm_stats(spark, sf_dir):
    return embedding_norm_stats(_t(spark, sf_dir, "embeddings"))


@register(
    "doc_chunks",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(trim(lower(text)), ' '), x -> x <> '') AS toks
      FROM documents),
    s AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks), 1), 40)) AS start
      FROM t)
    SELECT doc_id,
           CAST((start - 1) // 40 AS INTEGER)              AS chunk_idx,
           CAST(len(toks[start : start + 49]) AS INTEGER)  AS n_tokens,
           md5(array_to_string(toks[start : start + 49], ' ')) AS chunk_hash
    FROM s
    """,
    tags=("text", "chunking", "pipeline"),
    description="LLM-training document chunking: 50-token windows with 10-token "
    "overlap (stride 40) via sequence+slice — pure JVM array exprs, no explode of "
    "tokens (only of chunk starts), so cost is O(chunks) not O(tokens^2).",
)
def q_doc_chunks(spark, sf_dir):
    from .functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    toksed = docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("toks"))
    starts = F.sequence(F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(40))
    exploded = toksed.select(
        "doc_id", "toks", F.posexplode(starts).alias("chunk_idx", "start")
    )
    chunk = F.slice(F.col("toks"), F.col("start"), 50)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


@register(
    "stratified_sample_quota",
    """
    WITH h AS (
      SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hk FROM documents),
    r AS (
      SELECT doc_id, lang, hk,
             row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn
      FROM h)
    SELECT lang, doc_id, CAST(rn AS INTEGER) AS rn
    FROM r WHERE rn <= 10
    """,
    tags=("sampling", "stratified", "pipeline"),
    description="Stratified sampling with a fixed quota per stratum (10 docs per "
    "language), ordered by a deterministic md5 permutation — the mixture-balancing "
    "step of a training-data pipeline; one shuffle on the stratum key.",
)
def q_stratified_sample(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("hk")
    )
    w = Window.partitionBy("lang").orderBy(F.asc("hk"), F.asc("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("lang", "doc_id", "rn")
    )


@register(
    "bpe_token_counts",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS n_bpe,
             CAST(len(list_filter(string_split(trim(lower(text)), ' '), x -> x <> '')) AS INTEGER) AS n_ws
      FROM documents)
    SELECT lang,
           count(*)                 AS n_docs,
           sum(n_bpe)               AS total_bpe_tokens,
           sum(n_ws)                AS total_ws_tokens,
           {_R('avg(n_bpe)', 4)}    AS avg_bpe_per_doc,
           {_R('CAST(sum(n_bpe) AS DOUBLE) / sum(n_ws)', 6)} AS bpe_per_word
    FROM t GROUP BY lang
    """,
    tags=("text", "tokenize", "pipeline"),
    description="BPE-ish regex token counting (word / number / single-punct pieces — "
    "the pre-merge segmentation of a byte-pair tokenizer) vs whitespace tokens, "
    "aggregated per language: the token-budget accounting step of a training-data "
    "pipeline. Conservative regex subset executes identically on Java regex and RE2.",
)
def q_bpe_token_counts(spark, sf_dir):
    from .functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    n_bpe = F.size(F.regexp_extract_all(low, F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))
    n_ws = F.size(tokens(low))
    per_doc = docs.select("lang", n_bpe.alias("n_bpe"), n_ws.alias("n_ws"))
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        F.sum("n_ws").alias("total_ws_tokens"),
        _r(F.avg("n_bpe"), 4).alias("avg_bpe_per_doc"),
        _r(F.sum("n_bpe").cast("double") / F.sum("n_ws"), 6).alias("bpe_per_word"),
    )


# ---------------------------------------------------------------------------
# Quality / corpus-statistics additions (training-data pipeline surface)
# ---------------------------------------------------------------------------


@register(
    "repetition_ratio",
    f"""
    WITH t AS (
      SELECT doc_id, unnest({_TOKS.format(src='lower(text)')}) AS tok FROM documents),
    c AS (SELECT doc_id, tok, count(*) AS n FROM t GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           {_R("max(n) * 1.0 / sum(n)", 6)} AS top_share
    FROM c GROUP BY doc_id
    """,
    tags=("text", "quality", "dedup"),
    description="Repetition-ratio quality score: share of the most frequent token "
    "per document (boilerplate/spam signal — high top_share = repetitive doc). "
    "Explode → two-level hash agg, both with map-side partials; no windows.",
)
def q_repetition_ratio(spark, sf_dir):
    from .functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    per_tok = (
        docs.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_tok.groupBy("doc_id").agg(
        F.sum("n").alias("n_tokens"),
        _r(F.max("n") * 1.0 / F.sum("n"), 6).alias("top_share"),
    )


@register(
    "token_coverage",
    f"""
    WITH t AS (
      SELECT unnest({_TOKS.format(src='lower(text)')}) AS tok FROM documents),
    c AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
    r AS (SELECT tok, n,
                 CAST(row_number() OVER (ORDER BY n DESC, tok) AS INTEGER) AS rnk,
                 sum(n) OVER (ORDER BY n DESC, tok
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(n) OVER () AS total
          FROM c)
    SELECT rnk, tok, CAST(n AS BIGINT) AS n, {_R("cum * 1.0 / total", 6)} AS cum_share
    FROM r WHERE rnk <= 50
    """,
    tags=("text", "zipf", "window"),
    description="Zipf/token-coverage curve: global token frequencies, ranked, with "
    "the cumulative corpus share of the top-k vocabulary (BPE-vocab sizing / "
    "coverage analysis). The unpartitioned windows run AFTER aggregation — over "
    "the (small) distinct-token table, not the corpus.",
)
def q_token_coverage(spark, sf_dir):
    from pyspark.sql import Window

    from .functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_rank = Window.orderBy(F.desc("n"), F.asc("tok"))
    ranked = counts.select(
        F.row_number().over(w_rank).alias("rnk"),
        "tok",
        "n",
        F.sum("n").over(w_rank.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("n").over(Window.partitionBy()).alias("total"),
    )
    return ranked.where(F.col("rnk") <= 50).select(
        "rnk", "tok", "n", _r(F.col("cum") * 1.0 / F.col("total"), 6).alias("cum_share")
    )


@register(
    "embedding_centroids",
    f"""
    SELECT label, CAST(pos AS INTEGER) AS pos,
           {_R("CAST(sum(CAST(v AS DECIMAL(18,9))) AS DOUBLE) / count(*)", 6)} AS mean_v
    FROM (
      SELECT label, u.pos - 1 AS pos, u.v
      FROM embeddings,
           LATERAL (SELECT unnest(embedding) AS v,
                           generate_subscripts(embedding, 1) AS pos) u)
    GROUP BY label, pos
    """,
    tags=("similarity", "vector", "agg"),
    description="Per-label embedding centroids (the KMeans/IVF building block) "
    "in long form: posexplode the vector → per-(label, dimension) decimal-"
    "accumulated mean — one shuffle keyed by (label, pos), order-independent "
    "floats at any parallelism. Long form avoids a second shuffle to "
    "reassemble arrays; downstream consumers re-pivot only the tiny "
    "(n_labels × dim) result.",
)
def q_embedding_centroids(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    return exploded.groupBy("label", "pos").agg(
        _r(
            F.sum(F.col("v").cast("decimal(18,9)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_v")
    )


@register(
    "doc_winnowing",
    f"""
    WITH wt AS (SELECT doc_id, {_TOKS.format(src='lower(text)')} AS toks FROM documents),
    wh AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(len(toks) - 2, 0)),
               i -> {_H("concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])")}) AS hs
      FROM wt),
    wf AS (
      SELECT doc_id,
             CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                  WHEN len(hs) < 4 THEN [list_aggregate(hs, 'min')]
                  ELSE list_distinct(list_transform(
                         generate_series(1, len(hs) - 3),
                         i -> list_aggregate(hs[i:i+3], 'min')))
             END AS fps
      FROM wh)
    SELECT doc_id, unnest(fps) AS fp FROM wf
    """,
    tags=("fingerprint", "rolling-hash", "winnowing", "dedup"),
    description="Winnowing rolling-hash fingerprints (MOSS): positional 3-gram "
    "hashes, min over each 4-hash window, distinct minima per doc — the "
    "sub-linear local fingerprint for shared-passage detection; shared runs of "
    "≥6 tokens guarantee a shared fingerprint. Oracle replays hash/window/min "
    "selection exactly.",
)
def q_doc_winnowing(spark, sf_dir):
    from .operators.textops import winnowing_fingerprints

    return winnowing_fingerprints(_t(spark, sf_dir, "documents"), k=3, w=4)


@register(
    "ann_pq_knn",
    _ANN_GATE_ORACLE,
    tags=("similarity", "pq", "knn", "ml"),
    description="Product-quantization ANN top-5: per-subspace KMeans codebooks, "
    "code-only ADC scan (16x memory compression — the billion-vector path where raw "
    "vectors don't fit), exact cosine re-rank of the k*refine shortlist — folded into "
    "an oracle-able recall gate: recall_ok pins recall ≥ 0.9 (measured 0.98@sf0.001 / "
    "1.0@sf0.01); collapse fails the driver hash gate. Also gated in "
    "tests/test_scale_ops.py.",
)
def q_ann_pq(spark, sf_dir):
    from .operators.similarity import ann_recall_gate, knn_pq

    emb = _t(spark, sf_dir, "embeddings")
    approx = knn_pq(emb, query_ids_below=10, k=5)
    return ann_recall_gate(emb, approx, query_ids_below=10, k=5, floor=0.9)


@register(
    "dedup_keep_best",
    f"""
    WITH RECURSIVE {_JACCARD_CTES},
    p AS (SELECT doc_a, doc_b FROM jpairs WHERE jaccard >= 0.5),
    e(src, dst) AS (
      SELECT doc_a, doc_b FROM p UNION ALL SELECT doc_b, doc_a FROM p),
    r(node, lbl) AS (
      SELECT DISTINCT src, src FROM e
      UNION
      SELECT e.dst, r.lbl FROM r JOIN e ON e.src = r.node),
    clusters AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM r GROUP BY node),
    scored AS (
      SELECT c.cluster_id, c.doc_id,
             CAST(len({_TOKS.format(src='d.text')}) AS BIGINT) AS wc
      FROM clusters c JOIN documents d ON c.doc_id = d.doc_id),
    ranked AS (
      SELECT cluster_id, doc_id, wc,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY wc DESC, doc_id) AS rn
      FROM scored)
    SELECT cluster_id,
           CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keep_doc_id,
           CAST(max(CASE WHEN rn = 1 THEN wc END) AS BIGINT) AS kept_wc,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(CASE WHEN rn > 1 THEN wc ELSE 0 END) AS BIGINT) AS dropped_wc
    FROM ranked GROUP BY cluster_id
    """,
    tags=("dedup", "clusters", "quality", "pipeline"),
    description="Quality-aware dedup retention: near-dup clusters (Jaccard>=0.5 "
    "pairs -> connected components) keep the LONGEST member (word count, "
    "doc_id tie-break) instead of the lowest id — the keep-best policy "
    "production near-dedup uses so boilerplate stubs don't displace the full "
    "document. Per cluster: representative, its length, member count, and the "
    "token budget reclaimed. Integer scoring keeps the oracle bit-exact.",
)
def q_dedup_keep_best(spark, sf_dir):
    from pyspark.sql import Window

    from .functions.text import token_count
    from .operators.dedup import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.5, n=3, block_col="lang")
    clusters = dedup_clusters(pairs)
    scored = clusters.join(
        docs.select("doc_id", token_count(F.col("text")).cast("long").alias("wc")),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("wc"), F.asc("doc_id"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("cluster_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).cast("long").alias("keep_doc_id"),
        F.max(F.when(F.col("rn") == 1, F.col("wc"))).cast("long").alias("kept_wc"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum(F.when(F.col("rn") > 1, F.col("wc")).otherwise(0)).cast("long").alias("dropped_wc"),
    )


@register(
    "substring_dedup_windows",
    f"""
    WITH t AS (
      SELECT doc_id, {_TOKS.format(src='lower(text)')} AS toks FROM documents),
    w AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 20
                  THEN list_transform(
                         generate_series(0, len(toks) - 20, 20),
                         s -> {oracle_hash_sql("array_to_string(toks[s+1:s+20], ' ')")})
                  ELSE [] END AS hs
      FROM t),
    e AS (SELECT doc_id, unnest(hs) AS h FROM w),
    c AS (SELECT h, count(*) AS df FROM e GROUP BY h),
    p AS (
      SELECT e.doc_id,
             CAST(count(*) AS BIGINT)                              AS n_windows,
             CAST(sum(CASE WHEN c.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                                   AS n_dup_windows
      FROM e JOIN c USING (h) GROUP BY e.doc_id),
    m AS (
      SELECT t.doc_id,
             COALESCE(p.n_windows, 0)     AS n_windows,
             COALESCE(p.n_dup_windows, 0) AS n_dup_windows
      FROM t LEFT JOIN p USING (doc_id))
    SELECT doc_id, n_windows, n_dup_windows,
           {_R('CASE WHEN n_windows = 0 THEN 0.0 ELSE n_dup_windows * 1.0 / n_windows END', 6)}
             AS dup_win_frac,
           {_R('CASE WHEN n_windows = 0 THEN 0.0 ELSE n_dup_windows * 1.0 / n_windows END', 6)} >= 0.5
             AS flagged
    FROM m
    """,
    tags=("dedup", "substring", "pipeline"),
    description="Cross-document exact-substring duplication at 20-token "
    "window grain (the distributed approximation of Lee et al.'s suffix-"
    "array ExactSubstr dedup): disjoint windows hashed corpus-wide, a "
    "window duplicated iff its hash occurs more than once ANYWHERE "
    "(another doc or a repeat in the same doc), per-doc dup fraction with "
    "a >=0.5 flag. Complements the whole-doc (dedup_exact), near-dup "
    "(minhash/simhash/jaccard), and intra-doc (dup_ngram_fraction) "
    "families with the span-level axis. Shuffle carries 8-byte hashes "
    "only; no pair enumeration (see operators/dedup.py::"
    "substring_dup_stats).",
)
def q_substring_dedup_windows(spark, sf_dir):
    from .operators.dedup import substring_dup_stats

    return substring_dup_stats(_t(spark, sf_dir, "documents"), window=20)


# ---------------------------------------------------------------------------
# Semantic dedup: deterministic k-means (Lloyd's) + within-cluster cosine
# ---------------------------------------------------------------------------


def _kmeans_semantic_oracle(
    k: int = 8, iters: int = 2, threshold: float = 0.4
) -> str:
    """Unrolled-CTE replay of :func:`~.operators.similarity.kmeans_lloyd`
    (init = k smallest vec_ids; assignment = sequential-fold squared-L2
    argmin with smallest-cid ties; update = DECIMAL(18,9) per-dimension
    mean rounded to 6) followed by the SemDeDup retention rule: a vector
    is a duplicate when an earlier (smaller vec_id) member of the SAME
    cluster and the SAME adaptive sign-LSH bucket has cosine >= threshold."""
    d2 = (
        "list_reduce(list_transform(generate_series(1, len(v.vec)), "
        "i -> (v.vec[i] - c.cvec[i]) * (v.vec[i] - c.cvec[i])), "
        "(x, y) -> x + y)"
    )
    ctes = [
        f"v AS (SELECT vec_id, {_VEC} AS vec FROM embeddings)",
        f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)"
        f" AS cid, vec AS cvec"
        f" FROM (SELECT vec_id, vec FROM v ORDER BY vec_id LIMIT {k}))",
    ]
    for t in range(iters + 1):
        ctes.append(
            f"a{t} AS (SELECT vec_id, vec, cid FROM ("
            f"SELECT vec_id, vec, cid, "
            f"row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn "
            f"FROM (SELECT v.vec_id, v.vec, c.cid, {d2} AS d2 "
            f"FROM v CROSS JOIN c{t} c)) WHERE rn = 1)"
        )
        if t < iters:
            mean = _R(
                "CAST(sum(CAST(u.v AS DECIMAL(18,9))) AS DOUBLE) / count(*)", 6
            )
            ctes.append(
                f"c{t + 1} AS (SELECT cid, list(mv ORDER BY pos) AS cvec FROM ("
                f"SELECT cid, u.pos, {mean} AS mv "
                f"FROM a{t}, LATERAL (SELECT unnest(vec) AS v, "
                f"generate_subscripts(vec, 1) AS pos) u "
                f"GROUP BY cid, u.pos) GROUP BY cid)"
            )
    np_terms = " + ".join(
        f"(CASE WHEN cnt > {_LSH_TARGET << kk} THEN 1 ELSE 0 END)"
        for kk in range(_LSH_BASE, _LSH_CAP)
    )
    bits = " + ".join(
        f"CASE WHEN {j} < (SELECT np FROM params) AND "
        f"list_reduce(list_transform(generate_series(1, len(vec)), "
        f"i -> vec[i] * {_hp_sql(j)}), (a, b) -> a + b) > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for j in range(_LSH_CAP)
    )
    ctes += [
        f"params AS (SELECT {_LSH_BASE} + {np_terms} AS np "
        f"FROM (SELECT count(*) AS cnt FROM embeddings))",
        f"n AS (SELECT vec_id, vec, cid, {_FOLD_NORM.format(v='vec')} AS nrm, "
        f"{bits} AS bucket FROM a{iters})",
        f"dups AS (SELECT DISTINCT vec_b AS vec_id FROM ("
        f"SELECT b.vec_id AS vec_b, "
        f"{_R(_FOLD_DOT.format(a='a.vec', b='b.vec') + ' / (a.nrm * b.nrm)', 6)}"
        f" AS cosine "
        f"FROM n a JOIN n b ON a.cid = b.cid AND a.bucket = b.bucket "
        f"AND a.vec_id < b.vec_id) WHERE cosine >= {threshold})",
        f"norms AS (SELECT cid, {_R(_FOLD_NORM.format(v='cvec'), 6)} "
        f"AS centroid_norm FROM c{iters})",
    ]
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT a.cid, count(*) AS n_members,
           count(d.vec_id) AS n_dupes,
           count(*) - count(d.vec_id) AS n_kept,
           nm.centroid_norm
    FROM a{iters} a
    LEFT JOIN dups d USING (vec_id)
    JOIN norms nm ON nm.cid = a.cid
    GROUP BY a.cid, nm.centroid_norm
    """


@register(
    "semantic_dedup_kmeans",
    _kmeans_semantic_oracle(8, 2, 0.4),
    tags=("dedup", "semantic", "kmeans", "embedding", "ml"),
    description="SemDeDup-style semantic dedup (Abbas et al. 2023, public): "
    "deterministic distributed Lloyd's k-means (init = k smallest vec_ids; "
    "assignment is a shuffle-free Arrow-batched pandas_udf argmin against a "
    "broadcast NumPy centroid matrix — plan size constant in k, dims folded "
    "in order so it is bit-identical to the literal when-chain twin; "
    "DECIMAL-accumulated rounded centroid updates so cross-engine drift cannot "
    "compound) clusters the corpus; near-duplicates are then detected only "
    "within (cluster, adaptive sign-LSH bucket) blocks — cosine >= 0.4 against "
    "an earlier member marks a vector redundant. Output: per-cluster member/"
    "dupe/kept counts + rounded centroid norm (gates the k-means math "
    "directly). The oracle replays init, 3 assignment passes, 2 decimal "
    "centroid updates, adaptive np, bucketing, and the fold bit-for-bit.",
)
def q_semantic_dedup_kmeans(spark, sf_dir):
    return _semantic_dedup_kmeans_impl(spark, sf_dir, k=8, iters=2)


def _semantic_dedup_kmeans_impl(spark, sf_dir, k: int, iters: int):
    """The shared SemDeDup pipeline behind ``semantic_dedup_kmeans``
    (k=8, the oracle-pinned default) and ``semantic_dedup_kmeans_k64``
    (the k-knob proof) — cluster, bucket, within-(cid, bucket)
    earlier-member cosine, per-cluster counts + centroid norm."""
    from .functions.vectors import cosine_similarity, l2_norm
    from .operators.similarity import (
        adaptive_n_planes,
        kmeans_lloyd,
        lsh_bucket,
        lsh_hyperplanes,
    )

    emb = _t(spark, sf_dir, "embeddings")
    handles: list = []
    assigned, cents = kmeans_lloyd(emb, k=k, iters=iters, release=handles)
    # the assignment feeds the count, BOTH sides of the bucketed
    # self-join, and the final agg — persist so those are cache hits
    # instead of four recomputations of the nearest-centroid
    # projection (kmeans_lloyd already persists the projected source)
    assigned = assigned.persist()
    np_ = adaptive_n_planes(
        assigned.count(), base=_LSH_BASE, target=_LSH_TARGET, cap=_LSH_CAP
    )
    # the count above materialised `assigned` into ITS cache, which
    # supersedes kmeans_lloyd's source projection and final broadcast
    # for everything downstream — release both (re-shipped/re-computed
    # only if `assigned` is ever evicted)
    for h in handles:
        h.unpersist()
    planes = lsh_hyperplanes(64, np_, tag="hp")
    nb = assigned.withColumn("bucket", lsh_bucket(F.col("vec"), planes))
    a = nb.select(
        "cid", "bucket", F.col("vec_id").alias("vec_a"), F.col("vec").alias("va")
    )
    b = nb.select(
        "cid", "bucket", F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb")
    )
    dups = (
        a.join(b, ["cid", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(_r(cosine_similarity(F.col("va"), F.col("vb")), 6) >= 0.4)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    norms = spark.createDataFrame(
        [(cid, cvec) for cid, cvec in cents], "cid int, cvec array<double>"
    ).select("cid", _r(l2_norm(F.col("cvec")), 6).alias("centroid_norm"))
    return (
        assigned.join(dups, "vec_id", "left")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.coalesce(F.sum("is_dup"), F.lit(0)).cast("bigint").alias("n_dupes"),
        )
        .withColumn("n_kept", (F.col("n_members") - F.col("n_dupes")).cast("bigint"))
        .join(F.broadcast(norms), "cid")
        .select("cid", "n_members", "n_dupes", "n_kept", "centroid_norm")
    )


@register(
    "semantic_dedup_kmeans_k64",
    _kmeans_semantic_oracle(64, 1, 0.4),
    tags=("dedup", "semantic", "kmeans", "embedding", "ml"),
    description="The k-knob actually TURNING under the oracle gate: the "
    "same SemDeDup pipeline at k=64 — five times past the literal "
    "when-chain's analysis ceiling (~2^k expression nodes, OOMs at "
    "k~13), so this k is reachable ONLY through the vectorized "
    "Arrow-argmin assignment (plan size constant in k, broadcast "
    "NumPy centroid matrix, dims folded in order). The DuckDB oracle "
    "is data-driven (CROSS JOIN against the centroid CTE — its SQL is "
    "O(iters), independent of k), so it replays init, assignment, and "
    "the decimal centroid update bit-for-bit at this k too: the proof "
    "that 'k ∝ corpus size' is a knob the implementation can back, "
    "not just a docstring claim. One Lloyd pass (init + 1 update + "
    "final assignment) keeps the within-cluster pair stage k-bounded.",
)
def q_semantic_dedup_kmeans_k64(spark, sf_dir):
    return _semantic_dedup_kmeans_impl(spark, sf_dir, k=64, iters=1)


@register(
    "line_dedup_boilerplate",
    f"""
    WITH d AS (
      SELECT doc_id, lang,
             concat(text, '. subscribe to ', source, ' newsletter',
                    CASE WHEN doc_id % 2 = 0
                         THEN '. follow us for updates' ELSE '' END,
                    CASE WHEN doc_id % 7 = 0
                         THEN concat('. copyright ', lang) ELSE '' END,
                    '. ref id ', CAST(doc_id AS VARCHAR)) AS t2
      FROM documents),
    p AS (
      SELECT doc_id, lang,
             list_filter(string_split(t2, '. '), x -> x <> '') AS parts
      FROM d),
    l AS (
      SELECT doc_id, lang,
             unnest(list_transform(generate_series(1, len(parts)),
                    i -> struct_pack(idx := i - 1, line := parts[i]))) AS u
      FROM p),
    ln AS (
      SELECT doc_id, lang, u.idx AS idx, u.line AS line,
             lower(trim(u.line)) AS norm
      FROM l),
    b AS (
      SELECT norm FROM ln GROUP BY norm
      HAVING count(DISTINCT doc_id) >
             greatest((SELECT count(*) FROM documents) * 0.01, 1.0)),
    k AS (SELECT ln.* FROM ln ANTI JOIN b USING (norm)),
    r AS (
      SELECT doc_id, any_value(lang) AS lang,
             string_agg(line, '. ' ORDER BY idx) AS rebuilt,
             count(*) AS n_after
      FROM k GROUP BY doc_id),
    pre AS (
      SELECT lang, CAST(sum(len(parts)) AS BIGINT) AS n_lines_before
      FROM p GROUP BY lang)
    SELECT r.lang,
           count(*) AS n_docs,
           any_value(pre.n_lines_before) AS n_lines_before,
           CAST(sum(n_after) AS BIGINT) AS n_lines_kept,
           CAST(sum(length(rebuilt)) AS BIGINT) AS sum_chars_kept,
           CAST(sum({oracle_hash_sql(
               "concat(CAST(doc_id AS VARCHAR), '|', rebuilt)"
           )}) AS BIGINT) AS corpus_fp
    FROM r JOIN pre ON pre.lang = r.lang
    GROUP BY r.lang
    """,
    tags=("text", "dedup", "quality", "llm-pipeline"),
    description="CCNet-style line-level boilerplate removal (Wenzek et "
    "al. 2020: hash paragraphs, drop the ones shared across documents): "
    "documents are split into lines, each line is normalized "
    "(lower+trim) and counted by DISTINCT containing docs, and any line "
    "present in more than max(1% of the corpus, 1) docs is boilerplate "
    "— removed from EVERY document before the docs are reassembled in "
    "original line order. Because the fixture texts are single-line "
    "word bags, deterministic footer lines (per-source 'subscribe' "
    "footer, even-doc 'follow us', doc_id%7 per-lang copyright, and a "
    "per-doc unique 'ref id N') are appended with the SAME concat in "
    "both engines — the dedup must drop exactly the shared footers and "
    "keep the unique lines. Scale shape: the line-count aggregation "
    "shuffles once on the uniform normalized-line key; the boilerplate "
    "set is tiny BY DEFINITION (each member appears in >1% of docs, so "
    "there are at most ~100x avg-lines-per-doc of them) and is "
    "broadcast for the anti-join; reassembly shuffles once on doc_id; "
    "the relative threshold is computed in-plan from a broadcast 1-row "
    "total (no driver collect). The oracle replays split, normalize, "
    "threshold, anti-join, and ordered reassembly, and fingerprints "
    "every rebuilt document.",
)
def q_line_dedup_boilerplate(spark, sf_dir):
    from .functions.hashing import portable_hash64

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "text")
    d2 = docs.select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.lit(". subscribe to "), F.col("source"), F.lit(" newsletter"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(". follow us for updates"))
            .otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.lit(". copyright "), F.col("lang"))
            ).otherwise(F.lit("")),
            F.lit(". ref id "), F.col("doc_id").cast("string"),
        ).alias("t2"),
    )
    parts = d2.select(
        "doc_id", "lang",
        F.filter(F.split(F.col("t2"), "\\. "), lambda x: x != "").alias("parts"),
    )
    lines = parts.select(
        "doc_id", "lang", F.posexplode("parts").alias("idx", "line")
    ).withColumn("norm", F.lower(F.trim(F.col("line"))))
    total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    boiler = (
        lines.groupBy("norm")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .crossJoin(F.broadcast(total))
        .where(F.col("nd") > F.greatest(F.col("n_total") * 0.01, F.lit(1.0)))
        .select("norm")
    )
    kept = lines.join(F.broadcast(boiler), "norm", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.any_value(F.col("lang")).alias("lang"),
        F.concat_ws(
            ". ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "line"))),
                lambda s: s["line"],
            ),
        ).alias("rebuilt"),
        F.count(F.lit(1)).alias("n_after"),
    )
    pre = parts.groupBy("lang").agg(
        F.sum(F.size("parts")).cast("bigint").alias("n_lines_before")
    )
    return (
        rebuilt.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_after").cast("bigint").alias("n_lines_kept"),
            F.sum(F.length("rebuilt")).cast("bigint").alias("sum_chars_kept"),
            F.sum(
                portable_hash64(
                    F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("rebuilt"))
                )
            )
            .cast("bigint")
            .alias("corpus_fp"),
        )
        .join(F.broadcast(pre), "lang")
        .select(
            "lang", "n_docs", "n_lines_before", "n_lines_kept",
            "sum_chars_kept", "corpus_fp",
        )
    )


_PREFIX_JACCARD_CTES = f"""pt AS (
      -- NULL langs form their own block in the operator (coalesced to a
      -- "\\x00?" sentinel); mirror that here or NULL-lang docs would
      -- silently drop out of the equi-joins below
      SELECT doc_id, coalesce(lang, chr(0) || '?') AS lang,
             {_TOKS.format(src='lower(text)')} AS toks FROM documents),
    psh AS (SELECT doc_id, lang, {_SHINGLES} AS sh FROM pt),
    pposts AS (SELECT lang, doc_id, len(sh) AS sz, unnest(sh) AS shingle FROM psh),
    pdf AS (SELECT lang, shingle, count(*) AS df FROM pposts GROUP BY 1, 2),
    ppre AS (
      SELECT lang, doc_id, shingle FROM (
        SELECT p.lang, p.doc_id, p.sz, p.shingle,
               row_number() OVER (PARTITION BY p.lang, p.doc_id
                                  ORDER BY d.df, p.shingle) AS rk
        FROM pposts p JOIN pdf d
          ON d.lang = p.lang AND d.shingle = p.shingle)
      WHERE rk <= sz - ceil(0.5 * sz) + 1),
    pcand AS (
      SELECT DISTINCT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ppre a JOIN ppre b
        ON a.lang = b.lang AND a.shingle = b.shingle
       AND a.doc_id < b.doc_id),
    pver AS (
      SELECT c.doc_a, c.doc_b,
             {_R(_JACCARD.format(a='x.sh', b='y.sh'), 6)} AS jaccard
      FROM pcand c
      JOIN psh x ON x.lang = c.lang AND x.doc_id = c.doc_a
      JOIN psh y ON y.lang = c.lang AND y.doc_id = c.doc_b
      WHERE least(len(x.sh), len(y.sh)) * 1.0
            >= 0.5 * greatest(len(x.sh), len(y.sh)))"""


@register(
    "dedup_jaccard_prefix",
    f"""
    WITH {_PREFIX_JACCARD_CTES}
    SELECT doc_a, doc_b, jaccard FROM pver WHERE jaccard >= 0.5
    """,
    tags=("dedup", "jaccard", "prefix-filter"),
    description="Exact 3-gram-shingle Jaccard near-dup pairs via PREFIX "
    "FILTERING (Chaudhuri/Bayardo prefix filter, the PPJoin candidate "
    "rule) — the LOSSLESS scale path next to dedup_jaccard_pairs' "
    "max_df cap: shingles are globally ordered by ascending document "
    "frequency, each doc indexes only its first |d|-ceil(t|d|)+1 "
    "(rarest) shingles, docs sharing a prefix shingle become "
    "candidates, a length filter (min/max >= t) prunes, and candidates "
    "are verified EXACTLY on the full shingle sets — so unlike the "
    "df-capped baseline, no recall is traded at any df distribution, "
    "while the pair blowup stays bounded because ultra-common shingles "
    "only enter the prefixes of very short docs. The oracle replays "
    "df ranking, prefix slice, candidate join, length filter, and "
    "exact verification.",
)
def q_dedup_jaccard_prefix(spark, sf_dir):
    from .operators.dedup import jaccard_pairs_prefix

    return jaccard_pairs_prefix(
        _t(spark, sf_dir, "documents"), threshold=0.5, n=3, block_col="lang"
    )
