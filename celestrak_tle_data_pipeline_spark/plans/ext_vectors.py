"""[EXT] Similarity search over the ``embeddings`` table (SURVEY.md
§2.11 X2) — ANN for LLM-data pipelines.

Four tiers, scale-first:

- ``cosine_topk_exact``: brute-force cosine top-k — the baseline every
  ANN variant's recall is measured against. One broadcastable query
  side × a linear scan; no shuffle of the corpus.
- ``ann_ivf_topk``: IVF-style two-stage search — coarse-quantize every
  vector to its nearest leader (a deterministic codebook), probe only
  the query's 2 nearest buckets. The 100 TB shape: candidate
  generation is an equi-join on bucket id, so cost scales with probed
  buckets, not corpus size.
- ``ann_lsh_bucketed`` (rows-only): MLlib BucketedRandomProjectionLSH —
  seeded random hyperplanes, banded bucket join.
- ``embedding_cosine_near_dup``: cosine ≥ 0.95 within label buckets
  over a corpus with synthesized duplicates — the embedding tier of
  the dedup stack (ext_text holds the token tiers).

Numeric parity contract (bit-exact across Spark and DuckDB): every dot
product is a *sequential left fold* over elements cast to DOUBLE before
multiplying — ``aggregate(zip_with(...))`` in Spark, ``list_reduce``
in DuckDB — so float-summation order is pinned and identical. Never use
engine-native cosine helpers (summation order unspecified).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import register
from .common import t

_DIM = 64


def _dot(a, b):
    """Sequential-fold dot product in doubles (order-pinned)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"generate_series(1, {_DIM}), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), "
        f"(x, y) -> x + y)"
    )


def _vecs(spark, sf_dir):
    return t(spark, sf_dir, "embeddings")


# --------------------------------------------------------------------------
# exact brute-force cosine top-k
# --------------------------------------------------------------------------
_ORACLE_TOPK = f"""
WITH d AS (
    SELECT vec_id, embedding,
           sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
    FROM embeddings
),
q AS (SELECT * FROM d WHERE vec_id % 100 = 0),
scored AS (
    SELECT q.vec_id AS q_id, d.vec_id AS n_id,
           {_dot_sql('q.embedding', 'd.embedding')} / (q.nrm * d.nrm)
               AS cosine
    FROM q JOIN d ON q.vec_id <> d.vec_id
)
SELECT q_id, n_id, cosine,
       CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY cosine DESC, n_id
       ) AS BIGINT) AS rank
FROM scored
QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) <= 10
"""


@register("cosine_topk_exact", oracle=_ORACLE_TOPK)
def cosine_topk_exact(spark, sf_dir):
    """Brute-force cosine top-10 for each query vector (vec_id % 100 =
    0). Plan: tiny query side is broadcast; the corpus is scanned once,
    scored in whole-stage codegen, then only (q, candidate, score)
    triples — never vectors — go through the top-k window shuffle."""
    d = _vecs(spark, sf_dir).select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    q = d.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = (_dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )).alias("cosine")
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        d.join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("n_id"), cos)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 10)
    )


# --------------------------------------------------------------------------
# IVF-style probed search
# --------------------------------------------------------------------------
_ORACLE_IVF = f"""
WITH d AS (
    SELECT vec_id, embedding,
           sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
    FROM embeddings
),
leaders AS (SELECT * FROM d WHERE vec_id % 31 = 0),
assign AS (
    SELECT d.vec_id, d.embedding, d.nrm, l.vec_id AS bucket
    FROM d JOIN leaders l ON TRUE
    QUALIFY row_number() OVER (
        PARTITION BY d.vec_id
        ORDER BY {_dot_sql('d.embedding', 'l.embedding')} / (d.nrm * l.nrm)
                 DESC,
                 l.vec_id
    ) = 1
),
q AS (SELECT * FROM d WHERE vec_id % 100 = 0),
probes AS (
    SELECT q.vec_id AS q_id, q.embedding AS q_emb, q.nrm AS q_nrm,
           l.vec_id AS bucket
    FROM q JOIN leaders l ON TRUE
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY {_dot_sql('q.embedding', 'l.embedding')} / (q.nrm * l.nrm)
                 DESC,
                 l.vec_id
    ) <= 2
),
cand AS (
    SELECT p.q_id, a.vec_id AS n_id,
           {_dot_sql('p.q_emb', 'a.embedding')} / (p.q_nrm * a.nrm) AS cosine
    FROM probes p JOIN assign a ON p.bucket = a.bucket
    WHERE p.q_id <> a.vec_id
)
SELECT q_id, n_id, cosine,
       CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY cosine DESC, n_id
       ) AS BIGINT) AS rank
FROM cand
QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) <= 5
"""


@register("ann_ivf_topk", oracle=_ORACLE_IVF)
def ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN (X2 scale path): a deterministic leader codebook
    (every 31st vector), one coarse-quantization pass assigning each
    vector to its nearest leader, then queries probe only their 2
    nearest buckets. The expensive exact scoring runs on probed buckets
    only — the equi-join on bucket id is what makes this survive a
    corpus 1000× larger (cost ∝ probed fraction, not corpus)."""
    d = _vecs(spark, sf_dir).select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    leaders = d.where(F.col("vec_id") % 31 == 0).select(
        F.col("vec_id").alias("l_id"),
        F.col("embedding").alias("l_emb"),
        F.col("nrm").alias("l_nrm"),
    )
    lcos = _dot(F.col("embedding"), F.col("l_emb")) / (
        F.col("nrm") * F.col("l_nrm")
    )
    aw = Window.partitionBy("vec_id").orderBy(F.desc("lcos"), F.asc("l_id"))
    assign = (
        d.join(F.broadcast(leaders))
        .withColumn("lcos", lcos)
        .withColumn("r", F.row_number().over(aw))
        .where(F.col("r") == 1)
        .select("vec_id", "embedding", "nrm", F.col("l_id").alias("bucket"))
    )
    q = d.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    qcos = _dot(F.col("q_emb"), F.col("l_emb")) / (
        F.col("q_nrm") * F.col("l_nrm")
    )
    pw = Window.partitionBy("q_id").orderBy(F.desc("qcos"), F.asc("l_id"))
    probes = (
        q.join(F.broadcast(leaders))
        .withColumn("qcos", qcos)
        .withColumn("r", F.row_number().over(pw))
        .where(F.col("r") <= 2)
        .select("q_id", "q_emb", "q_nrm", F.col("l_id").alias("bucket"))
    )
    cos = (_dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )).alias("cosine")
    kw = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        assign.join(F.broadcast(probes), "bucket")
        .where(F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("n_id"), cos)
        .withColumn("rank", F.row_number().over(kw).cast("bigint"))
        .where(F.col("rank") <= 5)
    )


# --------------------------------------------------------------------------
# embedding-cosine near-dup (dedup tier)
# --------------------------------------------------------------------------
_ORACLE_NEAR_DUP = f"""
WITH corpus AS (
    SELECT vec_id, label, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 100000, label, embedding FROM embeddings
    WHERE vec_id % 10 = 0
),
d AS (
    SELECT vec_id, label, embedding,
           sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
    FROM corpus
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       {_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cosine
FROM d a JOIN d b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= 0.95
"""


@register("embedding_cosine_near_dup", oracle=_ORACLE_NEAR_DUP)
def embedding_cosine_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (the dedup stack's vector
    tier): cosine ≥ 0.95 within label buckets, over a corpus with
    synthesized exact copies (vec_id % 10 → +100000) since the driver
    corpus is random. Bucketing bounds the pair blowup; the unbucketed
    scale path is ann_lsh_bucketed."""
    base = _vecs(spark, sf_dir).select("vec_id", "label", "embedding")
    copies = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "label", "embedding"
    )
    d = (
        base.unionAll(copies)
        .withColumn("nrm", _norm(F.col("embedding")))
    )
    a, b = d.alias("a"), d.alias("b")
    cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= 0.95)
    )


# --------------------------------------------------------------------------
# per-label corpus stats
# --------------------------------------------------------------------------
@register(
    "embedding_label_stats",
    oracle=f"""
    WITH d AS (
        SELECT label, sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
        FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           CAST(SUM(CAST(nrm AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*)
               AS avg_norm,
           MIN(nrm) AS min_norm,
           MAX(nrm) AS max_norm
    FROM d GROUP BY label
    """,
)
def embedding_label_stats(spark, sf_dir):
    """Per-label corpus profile. The norm average goes through a
    fixed-scale decimal sum (order-independent — plans/common.py
    rationale) so the aggregate is reproducible on any partitioning."""
    d = _vecs(spark, sf_dir).select(
        "label", _norm(F.col("embedding")).alias("nrm")
    )
    return d.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (
            F.sum(F.col("nrm").cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_norm"),
        F.min("nrm").alias("min_norm"),
        F.max("nrm").alias("max_norm"),
    )


# --------------------------------------------------------------------------
# LSH-bucketed ANN (MLlib; rows-only)
# --------------------------------------------------------------------------
@register("ann_lsh_bucketed")  # no SQL oracle: MLlib LSH internals
def ann_lsh_bucketed(spark, sf_dir):
    """BucketedRandomProjectionLSH similarity join (X2 scale path,
    rows-only check): seeded random hyperplanes hash vectors into
    buckets; candidate pairs come from a bucket equi-join, scored
    exactly, filtered at euclidean distance ≤ 1.0. Deterministic via
    the fixed seed; exact-recall reference is cosine_topk_exact."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    base = _vecs(spark, sf_dir).select("vec_id", "embedding")
    copies = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    d = base.unionAll(copies).select(
        "vec_id", array_to_vector(F.col("embedding")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=0.5,
        numHashTables=4,
        seed=42,
    )
    model = lsh.fit(d)
    pairs = model.approxSimilarityJoin(d, d, 1.0, distCol="eucl_dist")
    return pairs.where(
        F.col("datasetA.vec_id") < F.col("datasetB.vec_id")
    ).select(
        F.col("datasetA.vec_id").alias("a_id"),
        F.col("datasetB.vec_id").alias("b_id"),
        F.col("eucl_dist"),
    )


# --------------------------------------------------------------------------
# LSH recall gate: exact euclidean pairs ⊆ LSH candidates, value-checked
# --------------------------------------------------------------------------
_EUCL_PAIRS_SQL = f"""
WITH corpus AS (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 10 = 0
),
p AS (
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           sqrt(list_reduce(list_prepend(0.0, list_transform(
               generate_series(1, {_DIM}),
               i -> (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)
                    * (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE))),
               (x, y) -> x + y)) AS eucl_dist
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
)
SELECT a_id, b_id, eucl_dist FROM p WHERE eucl_dist <= 1.0
"""


@register("ann_lsh_recall", oracle=_EUCL_PAIRS_SQL)
def ann_lsh_recall(spark, sf_dir):
    """Recall gate for the random-projection LSH path (X2),
    value-checked: exact euclidean-distance ≤ 1.0 pairs (order-pinned
    fold, squared via multiplication — pow() is a 1-ulp trap across
    engines) left-SEMI-joined with the seeded
    BucketedRandomProjectionLSH candidate set over the same augmented
    corpus (copies of every 10th vector injected as known dups). The
    oracle is the full exact-pair set, so a hash match asserts
    candidates ⊇ exact pairs — recall 1.0 under this seed/data; a
    regression in the LSH path shows up as missing rows, not a silent
    pass. The exact all-pairs side is the VERIFIER (bounded corpus);
    the bucket equi-join inside approxSimilarityJoin is the 100 TB
    shape. Complements rows-only ann_lsh_bucketed (raw candidate
    surface)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    base = _vecs(spark, sf_dir).select("vec_id", "embedding")
    copies = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = base.unionAll(copies)

    a, b = corpus.alias("a"), corpus.alias("b")
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("a.embedding"),
                F.col("b.embedding"),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    exact = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            dist.alias("eucl_dist"),
        )
        .where(F.col("eucl_dist") <= 1.0)
    )

    d = corpus.select(
        "vec_id", array_to_vector(F.col("embedding")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=0.5,
        numHashTables=4,
        seed=42,
    )
    cand = (
        lsh.fit(d)
        .approxSimilarityJoin(d, d, 1.0, distCol="dist")
        .where(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("a_id"),
            F.col("datasetB.vec_id").alias("b_id"),
        )
    )
    return exact.join(cand, ["a_id", "b_id"], "left_semi")


# --------------------------------------------------------------------------
# int8 scalar quantization + recall@k against the exact baseline
# --------------------------------------------------------------------------
def _sq_sql(col: str) -> str:
    """Quantize-reconstruct in SQL: clamp to [-0.5, 0.5], scale to
    [-127, 127], round, rescale — the int8 storage codec."""
    return (
        f"list_transform({col}, v -> "
        f"round(least(greatest(v::DOUBLE, -0.5), 0.5) * 254.0) / 254.0)"
    )


_ORACLE_SQ = f"""
WITH d AS (
    SELECT vec_id, embedding,
           {_sq_sql('embedding')} AS sq,
           sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
    FROM embeddings
),
dq AS (
    SELECT vec_id, sq,
           sqrt(list_reduce(list_prepend(0.0, list_transform(
               generate_series(1, {_DIM}), i -> sq[i] * sq[i])),
               (x, y) -> x + y)) AS qnrm
    FROM d
),
q AS (SELECT * FROM d WHERE vec_id % 100 = 0),
exact_k AS (
    SELECT q.vec_id AS q_id, d.vec_id AS n_id
    FROM q JOIN d ON q.vec_id <> d.vec_id
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY {_dot_sql('q.embedding', 'd.embedding')} / (q.nrm * d.nrm)
                 DESC, d.vec_id
    ) <= 10
),
qq AS (SELECT * FROM dq WHERE vec_id % 100 = 0),
sq_k AS (
    SELECT qq.vec_id AS q_id, dq.vec_id AS n_id
    FROM qq JOIN dq ON qq.vec_id <> dq.vec_id
    QUALIFY row_number() OVER (
        PARTITION BY qq.vec_id
        ORDER BY list_reduce(list_prepend(0.0, list_transform(
                     generate_series(1, {_DIM}),
                     i -> qq.sq[i] * dq.sq[i])), (x, y) -> x + y)
                 / (qq.qnrm * dq.qnrm) DESC, dq.vec_id
    ) <= 10
)
SELECT e.q_id,
       CAST(COUNT(s.n_id) AS BIGINT) AS n_overlap,
       COUNT(s.n_id) / 10.0 AS recall_at_10
FROM exact_k e LEFT JOIN sq_k s
  ON e.q_id = s.q_id AND e.n_id = s.n_id
GROUP BY e.q_id
"""


@register("embedding_sq8_recall", oracle=_ORACLE_SQ)
def embedding_sq8_recall(spark, sf_dir):
    """int8 scalar quantization (the embedding-compression codec a
    100 TB vector store runs: 4x smaller than float32, cheaper dot
    products) measured honestly: top-10 under quantized cosine vs the
    exact float baseline → recall@10 per query. Quantization is a
    fixed-scale clamp+round (no data-dependent calibration pass), so
    the whole codec + recall computation is deterministic and
    oracle-checked."""
    sq = F.transform(
        F.col("embedding"),
        lambda v: F.round(
            F.least(F.greatest(v.cast("double"), F.lit(-0.5)), F.lit(0.5))
            * 254.0,
            0,
        )
        / 254.0,
    )
    d = _vecs(spark, sf_dir).select(
        "vec_id",
        "embedding",
        sq.alias("sq"),
        _norm(F.col("embedding")).alias("nrm"),
    )
    d = d.withColumn(
        "qnrm",
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("sq"), F.col("sq"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
    )

    def topk(score_from, emb_col, nrm_col):
        q = d.where(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("q_id"),
            F.col(emb_col).alias("q_emb"),
            F.col(nrm_col).alias("q_nrm"),
        )
        cos = _dot(F.col("q_emb"), F.col(emb_col)) / (
            F.col("q_nrm") * F.col(nrm_col)
        )
        w = Window.partitionBy("q_id").orderBy(
            F.desc("cosine"), F.asc("n_id")
        )
        return (
            d.join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
            .select("q_id", F.col("vec_id").alias("n_id"), cos.alias("cosine"))
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 10)
            .select("q_id", "n_id")
        )

    exact_k = topk("exact", "embedding", "nrm")
    sq_k = topk("sq", "sq", "qnrm").withColumnRenamed("n_id", "s_n_id")
    return (
        exact_k.join(
            sq_k,
            (exact_k.q_id == sq_k.q_id) & (exact_k.n_id == sq_k.s_n_id),
            "left",
        )
        .groupBy(exact_k.q_id)
        .agg(
            F.count("s_n_id").alias("n_overlap"),
            (F.count("s_n_id") / F.lit(10.0)).alias("recall_at_10"),
        )
    )


# --------------------------------------------------------------------------
# higher-order-function vector kernel bundle
# --------------------------------------------------------------------------
_ORACLE_HOF = f"""
WITH d AS (
    SELECT vec_id, embedding,
           sqrt({_dot_sql('embedding', 'embedding')}) AS nrm,
           list_reduce(list_prepend(0.0, list_transform(
               generate_series(1, {_DIM}), i -> embedding[i]::DOUBLE)),
               (x, y) -> x + y) AS el_sum,
           {_dot_sql('embedding', 'list_reverse(embedding)')} AS rev_dot
    FROM embeddings
)
SELECT vec_id,
       nrm,
       CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS el_min,
       CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS el_max,
       el_sum,
       embedding[1]::DOUBLE / nrm AS unit_first,
       rev_dot
FROM d
"""


@register("vector_hof_bundle", oracle=_ORACLE_HOF)
def vector_hof_bundle(spark, sf_dir):
    """Array higher-order-function kernel bundle over the embedding
    column: L2 norm (sequential fold), element min/max, pinned-order
    element sum, first element of the unit-normalized vector, and a
    zip_with against the REVERSED vector (rev_dot) — the building
    blocks of vector math (normalize, center, project) expressed
    entirely in Catalyst HOFs.

    Scale shape: pure per-row projection in whole-stage codegen — no
    shuffle, no Python, no UDF. This is the vectorized alternative to a
    NumPy pandas_udf for element-wise kernels: at 100 TB it runs where
    the data is, with zero Arrow transfer cost. Every float reduction
    is an order-pinned sequential fold so DuckDB reproduces it
    bit-for-bit (module contract above).
    """
    e = F.col("embedding")
    nrm = _norm(e)
    return _vecs(spark, sf_dir).select(
        "vec_id",
        nrm.alias("nrm"),
        F.array_min(e).cast("double").alias("el_min"),
        F.array_max(e).cast("double").alias("el_max"),
        F.aggregate(
            e, F.lit(0.0), lambda acc, x: acc + x.cast("double")
        ).alias("el_sum"),
        (F.element_at(e, 1).cast("double") / nrm).alias("unit_first"),
        _dot(e, F.reverse(e)).alias("rev_dot"),
    )


# --------------------------------------------------------------------------
# product quantization (PQ/ADC) recall gate
# --------------------------------------------------------------------------
_PQ_SUBS = 4
_PQ_LEN = _DIM // _PQ_SUBS


def _pq_slice_sql(col: str, s: int) -> str:
    lo = s * _PQ_LEN + 1
    return f"{col}[{lo}:{lo + _PQ_LEN - 1}]"


def _pq_fold_sql(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"generate_series(1, {_PQ_LEN}), i -> {expr})), (x, y) -> x + y)"
    )


def _pq_pinned_sum_sql(expr: str, sub_ref: str = "sub_id") -> str:
    """Order-pinned sum of the 4 per-subspace folds.

    A plain SUM() over the 4 doubles reduces in shuffle/scan-arrival
    order — an ulp difference vs the other engine can flip a top-10
    near-tie. Each conditional SUM aggregates exactly ONE row (exact
    regardless of order); the outer additions are a fixed
    left-associative expression, identical in Spark and DuckDB.
    """
    fold = _pq_fold_sql(expr)
    return " + ".join(
        f"SUM(CASE WHEN {sub_ref} = {s} THEN {fold} END)"
        for s in range(_PQ_SUBS)
    )


_PQ_SUB_UNION = " UNION ALL ".join(
    f"SELECT vec_id, {s} AS sub_id, "
    f"list_transform({_pq_slice_sql('embedding', s)}, v -> v::DOUBLE) AS sl "
    f"FROM d"
    for s in range(_PQ_SUBS)
)

_ORACLE_PQ = f"""
WITH d AS (
    SELECT vec_id, embedding,
           sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
    FROM embeddings
),
slices AS ({_PQ_SUB_UNION}),
leaders AS (
    SELECT vec_id AS leader_id, sub_id, sl AS cs
    FROM slices WHERE vec_id % 31 = 0
),
assign AS (
    SELECT s.vec_id, s.sub_id, l.leader_id, l.cs
    FROM slices s JOIN leaders l ON s.sub_id = l.sub_id
    QUALIFY row_number() OVER (
        PARTITION BY s.vec_id, s.sub_id
        ORDER BY {_pq_fold_sql('(s.sl[i] - l.cs[i]) * (s.sl[i] - l.cs[i])')}
                 ASC, l.leader_id
    ) = 1
),
codenorm AS (
    SELECT vec_id,
           sqrt({_pq_pinned_sum_sql('cs[i] * cs[i]')}) AS cnrm
    FROM assign GROUP BY vec_id
),
qs AS (SELECT * FROM slices WHERE vec_id % 100 = 0),
qn AS (SELECT vec_id, nrm FROM d WHERE vec_id % 100 = 0),
adc AS (
    SELECT q.vec_id AS q_id, a.vec_id AS n_id,
           {_pq_pinned_sum_sql('q.sl[i] * a.cs[i]', 'q.sub_id')} AS dot
    FROM qs q JOIN assign a ON q.sub_id = a.sub_id
    WHERE q.vec_id <> a.vec_id
    GROUP BY 1, 2
),
pq_k AS (
    SELECT adc.q_id, adc.n_id
    FROM adc
    JOIN qn ON qn.vec_id = adc.q_id
    JOIN codenorm c ON c.vec_id = adc.n_id
    QUALIFY row_number() OVER (
        PARTITION BY adc.q_id
        ORDER BY adc.dot / (qn.nrm * c.cnrm) DESC, adc.n_id
    ) <= 10
),
q AS (SELECT * FROM d WHERE vec_id % 100 = 0),
exact_k AS (
    SELECT q.vec_id AS q_id, d.vec_id AS n_id
    FROM q JOIN d ON q.vec_id <> d.vec_id
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY {_dot_sql('q.embedding', 'd.embedding')} / (q.nrm * d.nrm)
                 DESC, d.vec_id
    ) <= 10
)
SELECT e.q_id,
       CAST(COUNT(s.n_id) AS BIGINT) AS n_overlap,
       COUNT(s.n_id) / 10.0 AS recall_at_10
FROM exact_k e LEFT JOIN pq_k s
  ON e.q_id = s.q_id AND e.n_id = s.n_id
GROUP BY e.q_id
"""


@register("embedding_pq_recall", oracle=_ORACLE_PQ)
def embedding_pq_recall(spark, sf_dir):
    """Product quantization with asymmetric distance (PQ/ADC) — the
    OTHER standard vector-store codec next to SQ8: each vector is
    split into 4 subvectors, each subvector replaced by its nearest
    entry of a per-subspace codebook (here: the deterministic leader
    set, vec_id % 31), and query-to-vector similarity is the sum of
    exact query-subvector x code dot products. Memory per vector drops
    to 4 code ids; score cost to 4 table lookups at serving time.
    Measured honestly as recall@10 against the exact float top-10,
    same protocol as embedding_sq8_recall.

    Everything is deterministic (argmin with leader-id tiebreak,
    order-pinned folds), so codebook assignment, ADC scores, and the
    recall matrix all sit under the value gate in both engines.

    Scale shape: assignment is a broadcast join vs the tiny codebook
    (cost linear in corpus x codebook); ADC scoring joins each query's
    4 subvectors against pre-assigned codes — at 100 TB the codes are
    16x smaller than the floats they replace, which is the point.
    """

    def sub_slices(df, id_alias):
        return df.select(
            F.col("vec_id").alias(id_alias),
            F.explode(
                F.array(
                    *(
                        F.struct(
                            F.lit(s).alias("sub_id"),
                            F.transform(
                                F.slice(
                                    "embedding", s * _PQ_LEN + 1, _PQ_LEN
                                ),
                                lambda v: v.cast("double"),
                            ).alias("sl"),
                        )
                        for s in range(_PQ_SUBS)
                    )
                )
            ).alias("p"),
        ).select(id_alias, "p.sub_id", "p.sl")

    d = _vecs(spark, sf_dir).select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    slices = sub_slices(d, "vec_id")
    leaders = (
        slices.where(F.col("vec_id") % 31 == 0)
        .select(
            F.col("vec_id").alias("leader_id"),
            "sub_id",
            F.col("sl").alias("cs"),
        )
    )
    l2 = F.aggregate(
        F.zip_with("sl", "cs", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w_assign = Window.partitionBy("vec_id", "sub_id").orderBy(
        F.asc("l2d"), F.asc("leader_id")
    )
    assign = (
        slices.join(F.broadcast(leaders), "sub_id")
        .withColumn("l2d", l2)
        .withColumn("rk", F.row_number().over(w_assign))
        .where(F.col("rk") == 1)
        .select("vec_id", "sub_id", "cs")
    )
    # Order-pinned reduction over the 4 subspaces (mirrors the oracle's
    # _pq_pinned_sum_sql): each conditional sum sees exactly one row per
    # group, and the outer additions are a fixed left-associative
    # expression — no shuffle-arrival-order float dependence.
    sub_sq = F.aggregate(
        F.zip_with("cs", "cs", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def _pinned(col):
        total = F.sum(F.when(F.col("sub_id") == 0, col))
        for s in range(1, _PQ_SUBS):
            total = total + F.sum(F.when(F.col("sub_id") == s, col))
        return total

    codenorm = (
        assign.withColumn("sq", sub_sq)
        .groupBy("vec_id")
        .agg(F.sqrt(_pinned(F.col("sq"))).alias("cnrm"))
    )
    qs = slices.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "sub_id", F.col("sl").alias("qsl")
    )
    qn = d.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("nrm").alias("q_nrm")
    )
    sub_dot = F.aggregate(
        F.zip_with("qsl", "cs", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    adc = (
        F.broadcast(qs)
        .join(assign, "sub_id")
        .where(F.col("q_id") != F.col("vec_id"))
        .withColumn("sd", sub_dot)
        .groupBy("q_id", F.col("vec_id").alias("n_id"))
        .agg(_pinned(F.col("sd")).alias("dot"))
    )
    w_pq = Window.partitionBy("q_id").orderBy(
        F.desc("pq_cos"), F.asc("n_id")
    )
    pq_k = (
        adc.join(F.broadcast(qn), "q_id")
        .join(codenorm.withColumnRenamed("vec_id", "n_id"), "n_id")
        .withColumn("pq_cos", F.col("dot") / (F.col("q_nrm") * F.col("cnrm")))
        .withColumn("rk", F.row_number().over(w_pq))
        .where(F.col("rk") <= 10)
        .select("q_id", F.col("n_id").alias("p_n_id"))
    )
    q = d.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )
    w_ex = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    exact_k = (
        d.join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("n_id"), cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w_ex))
        .where(F.col("rk") <= 10)
        .select("q_id", "n_id")
    )
    return (
        exact_k.join(
            pq_k,
            (exact_k.q_id == pq_k.q_id) & (exact_k.n_id == pq_k.p_n_id),
            "left",
        )
        .groupBy(exact_k.q_id)
        .agg(
            F.count("p_n_id").alias("n_overlap"),
            (F.count("p_n_id") / F.lit(10.0)).alias("recall_at_10"),
        )
    )


# --------------------------------------------------------------------------
# X2b: contrastive hard-negative mining
# --------------------------------------------------------------------------
_ORACLE_HARD_NEG = f"""
WITH d AS (
    SELECT vec_id, label, embedding,
           sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
    FROM embeddings
),
q AS (SELECT * FROM d WHERE vec_id % 100 = 0),
scored AS (
    SELECT q.vec_id AS q_id, q.label AS q_label,
           d.vec_id AS n_id, d.label AS n_label,
           {_dot_sql('q.embedding', 'd.embedding')} / (q.nrm * d.nrm)
               AS cosine
    FROM q JOIN d ON q.label <> d.label
)
SELECT q_id, q_label, n_id, n_label, cosine,
       CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY cosine DESC, n_id
       ) AS BIGINT) AS rank
FROM scored
QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) <= 3
"""


@register("hard_negative_mining", oracle=_ORACLE_HARD_NEG)
def hard_negative_mining(spark, sf_dir):
    """Contrastive hard-negative mining (X2b): for each query vector,
    the 3 most-cosine-similar vectors carrying a DIFFERENT label — the
    pairs a contrastive/embedding trainer wants as negatives precisely
    because the current geometry confuses them. (The different-label
    predicate is what separates this from cosine_topk_exact: nearest
    SAME-label neighbors are easy positives, nearest different-label
    neighbors are the gradient-rich examples.)

    Plan: identical scale shape to the exact top-k baseline — the tiny
    query side broadcasts, the corpus scans once with the label
    inequality fused into the broadcast join condition (rows die before
    scoring), scores stay (id, id, double) triples through the top-3
    window shuffle; vectors never shuffle. At production scale the same
    query swaps its corpus scan for the IVF-bucketed candidate set."""
    d = _vecs(spark, sf_dir).select(
        "vec_id", "label", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    q = d.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = (
        _dot(F.col("q_emb"), F.col("embedding"))
        / (F.col("q_nrm") * F.col("nrm"))
    ).alias("cosine")
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        d.join(F.broadcast(q), F.col("q_label") != F.col("label"))
        .select(
            "q_id",
            "q_label",
            F.col("vec_id").alias("n_id"),
            F.col("label").alias("n_label"),
            cos,
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 3)
    )


# --------------------------------------------------------------------------
# X43: integer-exact Lloyd k-means (2 unrolled iterations, value-gated)
# --------------------------------------------------------------------------

_KM_DIST = (
    "CAST(list_sum(list_transform(generate_series(1, 64), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
)

_ORACLE_KMEANS = f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
               v -> CAST(floor(v::DOUBLE * 1000000) AS BIGINT)) AS qa
    FROM embeddings
),
idx AS (SELECT unnest(generate_series(1, 64)) AS i),
c0 AS (
    SELECT vec_id AS cluster, qa AS cvec FROM q ORDER BY vec_id LIMIT 4
),
s1 AS (
    SELECT q.vec_id, c.cluster,
           {_KM_DIST.format(a='q.qa', b='c.cvec')} AS d2
    FROM q CROSS JOIN c0 c
),
a1 AS (
    SELECT vec_id, cluster, d2 FROM s1
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY d2, cluster
    ) = 1
),
e1 AS (
    SELECT a.cluster, i.i, q.qa[i.i] AS val
    FROM a1 a JOIN q ON a.vec_id = q.vec_id CROSS JOIN idx i
),
m1 AS (
    SELECT cluster, i,
           CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS cval
    FROM e1 GROUP BY cluster, i
),
c1 AS (
    SELECT cluster, list(cval ORDER BY i) AS cvec FROM m1 GROUP BY cluster
),
s2 AS (
    SELECT q.vec_id, c.cluster,
           {_KM_DIST.format(a='q.qa', b='c.cvec')} AS d2
    FROM q CROSS JOIN c1 c
),
a2 AS (
    SELECT vec_id, cluster, d2 FROM s2
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY d2, cluster
    ) = 1
)
SELECT a1.vec_id,
       a1.cluster AS cluster_it1,
       a2.cluster AS cluster_it2,
       a2.d2 AS dist2_micro
FROM a1 JOIN a2 ON a1.vec_id = a2.vec_id
"""


def _km_assign(q, cents):
    """One Lloyd assignment step: nearest centroid by exact bigint
    squared distance, ties to the lowest cluster id."""
    d2 = F.aggregate(
        F.zip_with(
            F.col("qa"), F.col("cvec"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        q.crossJoin(F.broadcast(cents))
        .select("vec_id", "cluster", d2.alias("d2"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cluster")).alias("m"))
        .select(
            "vec_id",
            F.col("m.cluster").alias("cluster"),
            F.col("m.d2").alias("d2"),
        )
    )


@register("kmeans_lloyd_integer", oracle=_ORACLE_KMEANS)
def kmeans_lloyd_integer(spark, sf_dir):
    """Integer-exact Lloyd k-means (X43): k=4, two unrolled iterations,
    every quantity exact — the clustering twin of the integer PageRank.
    Float k-means can't sit under a cross-engine value gate (centroid
    means are order-sensitive float sums); quantizing each vector to
    bigint micro-units (floor(v*1e6)) makes distances exact bigint
    sums (order-free), centroid updates exact floor-div means, and
    argmin assignment a total order with a cluster-id tiebreak — so
    the WHOLE iterative algorithm is bit-reproducible on any
    partitioning, in both engines.

    Shapes, per iteration: the k=4 centroid table is broadcast, so
    assignment is a map-only scored scan + a partial-aggregated argmin
    (one row per vector through the shuffle, never the vector);
    centroid update explodes assigned vectors to (cluster, dim, val)
    rows and hash-aggregates k*64 cells (map-side combine does the
    heavy lifting), then rebuilds the k arrays. The floor-div mean is
    safe in doubles: |sum| < 2^53 and the true quotient is either
    exact or >= 1/n away from an integer, so floor() cannot straddle.

    The driver sees nothing: two fixed iterations, no convergence
    loop, no collect — at scale you iterate by re-running the same
    two-stage round with the previous round's k-row centroid table."""
    q = _vecs(spark, sf_dir).select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda v: F.floor(v.cast("double") * 1000000).cast("bigint"),
        ).alias("qa"),
    )
    c0 = (
        q.orderBy("vec_id")
        .limit(4)
        .select(F.col("vec_id").alias("cluster"), F.col("qa").alias("cvec"))
    )
    a1 = _km_assign(q, c0)
    e1 = (
        a1.select("vec_id", "cluster")
        .join(q, "vec_id")
        .select("cluster", F.posexplode("qa").alias("pos", "val"))
    )
    m1 = e1.groupBy("cluster", "pos").agg(
        F.floor(F.sum("val").cast("double") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("cval")
    )
    c1 = m1.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s["cval"],
        ).alias("cvec")
    )
    a2 = _km_assign(q, c1)
    return (
        a1.select("vec_id", F.col("cluster").alias("cluster_it1"))
        .join(
            a2.select(
                "vec_id",
                F.col("cluster").alias("cluster_it2"),
                F.col("d2").alias("dist2_micro"),
            ),
            "vec_id",
        )
    )


# --------------------------------------------------------------------------
# MMR diversified top-k retrieval (integer-exact greedy)
# --------------------------------------------------------------------------
@register(
    "mmr_diversified_topk",
    oracle="""
    WITH RECURSIVE
    qv AS (
        SELECT list_transform(embedding,
               x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT)) AS q
        FROM embeddings WHERE vec_id = 0
    ),
    cand AS (
        SELECT e.vec_id,
               CAST(list_dot_product(
                   list_transform(e.embedding,
                       x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT)), qv.q)
                   AS BIGINT) AS rel,
               list_transform(e.embedding,
                   x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT)) AS qe
        FROM embeddings e, qv
        WHERE e.vec_id <> 0
        ORDER BY rel DESC, e.vec_id
        LIMIT 50
    ),
    sims AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               CAST(list_dot_product(a.qe, b.qe) AS BIGINT) AS s
        FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    sel AS (
        SELECT 1 AS k,
               (SELECT vec_id FROM cand ORDER BY rel DESC, vec_id
                LIMIT 1) AS picked,
               [(SELECT vec_id FROM cand ORDER BY rel DESC, vec_id
                 LIMIT 1)] AS ids
        UNION ALL
        SELECT k + 1 AS k,
               (SELECT c.vec_id
                FROM cand c
                WHERE NOT list_contains(sel.ids, c.vec_id)
                ORDER BY c.rel - (SELECT MAX(s.s) FROM sims s
                                  WHERE s.ia = c.vec_id
                                    AND list_contains(sel.ids, s.ib))
                         DESC,
                         c.vec_id
                LIMIT 1) AS picked,
               list_append(sel.ids,
                   (SELECT c.vec_id
                    FROM cand c
                    WHERE NOT list_contains(sel.ids, c.vec_id)
                    ORDER BY c.rel - (SELECT MAX(s.s) FROM sims s
                                      WHERE s.ia = c.vec_id
                                        AND list_contains(sel.ids, s.ib))
                             DESC,
                             c.vec_id
                    LIMIT 1)) AS ids
        FROM sel WHERE k < 10
    )
    SELECT CAST(sel.k AS BIGINT) AS rank,
           CAST(sel.picked AS BIGINT) AS vec_id,
           c.rel AS rel_q6,
           CAST(COALESCE((SELECT MAX(s.s) FROM sims s
                JOIN sel s2 ON s2.k = sel.k - 1
                WHERE s.ia = sel.picked
                  AND list_contains(s2.ids, s.ib)), 0)
               AS BIGINT) AS max_sim_q6
    FROM sel JOIN cand c ON c.vec_id = sel.picked
    ORDER BY rank
    """,
)
def mmr_diversified_topk(spark, sf_dir):
    """Maximal-marginal-relevance diversified top-10 (Carbonell &
    Goldstein, SIGIR'98): plain top-k returns near-duplicates of the
    best hit; MMR greedily picks argmax of rel(c) − max_sim(c,
    selected) (the λ=1/2 criterion up to positive scaling), trading
    relevance against redundancy — the selection rule retrieval uses
    to build a diverse context and curation uses to pick
    representative training examples from a dense cluster.

    A greedy sequential argmax is not order-independent float-safe, so
    the whole query runs on INTEGER-quantized vectors (q6 =
    round(x·1e6)): every relevance and pairwise similarity is an exact
    int64 dot (|dot| ≤ 64·(0.6e6)² ≈ 2.3e13 < 2^53, so even an engine
    computing through doubles is exact), every argmax breaks ties on
    vec_id, and the selected sequence is bit-reproducible in any
    engine — the DuckDB oracle replays the same greedy as a recursive
    CTE.

    Plan: relevance is one JVM-side aggregate(zip_with) map pass; the
    candidate pool compiles to TakeOrderedAndProject (top-50, no
    single-partition exchange); only the greedy itself — inherently
    sequential, pool-sized, 50×50 int dots — runs in ONE Arrow batch
    via applyInPandas. At 100 TB the pool is still 50 rows: the scan
    scales, the kernel is a constant."""
    import numpy as np
    import pandas as pd

    e = t(spark, sf_dir, "embeddings")
    q6 = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * 1000000).cast("bigint"),
    )
    vecs = e.select("vec_id", q6.alias("qe"))
    qv = vecs.where(F.col("vec_id") == 0).select(
        F.col("qe").alias("q_emb")
    )
    idot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    pool = (
        vecs.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", "qe", idot(F.col("qe"), F.col("q_emb")).alias("rel")
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(50)
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        M = np.array(pdf["qe"].tolist(), dtype=np.int64)
        rel = pdf["rel"].to_numpy(np.int64)
        ids = pdf["vec_id"].to_numpy(np.int64)
        S = M @ M.T
        n = len(ids)
        mask = np.ones(n, dtype=bool)
        ms = np.zeros(n, dtype=np.int64)  # k=1 scores by rel alone
        out = []
        for k in range(1, min(10, n) + 1):
            idx = np.flatnonzero(mask)
            sc = rel[idx] - ms[idx]
            best = sc.max()
            tied = idx[sc == best]
            pick = tied[np.argmin(ids[tied])]
            out.append(
                (k, ids[pick], rel[pick], ms[pick] if k > 1 else 0)
            )
            mask[pick] = False
            if k == 1:
                ms = S[:, pick].copy()  # true max-sims from now on
            else:
                np.maximum(ms, S[:, pick], out=ms)
        return pd.DataFrame(
            out, columns=["rank", "vec_id", "rel_q6", "max_sim_q6"]
        )

    return (
        pool.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            greedy,
            schema="rank long, vec_id long, rel_q6 long, max_sim_q6 long",
        )
    )


# --------------------------------------------------------------------------
# nearest-centroid classification, integer-exact (confusion matrix)
# --------------------------------------------------------------------------
@register(
    "centroid_classifier_confusion",
    oracle="""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(round(x::DOUBLE * 100) AS BIGINT)) AS q
        FROM embeddings
    ),
    el AS (
        SELECT v.vec_id, v.label, g.i AS pos, q[g.i] AS qv
        FROM v, LATERAL unnest(generate_series(1, len(q))) AS g(i)
    ),
    s AS (
        SELECT label, pos, CAST(SUM(qv) AS BIGINT) AS sv
        FROM el GROUP BY 1, 2
    ),
    nl AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1),
    s2 AS (
        SELECT label, CAST(SUM(sv * sv) AS BIGINT) AS snorm2
        FROM s GROUP BY 1
    ),
    xn AS (
        SELECT vec_id, CAST(SUM(qv * qv) AS BIGINT) AS xnorm2
        FROM el GROUP BY 1
    ),
    dots AS (
        SELECT el.vec_id, s.label, CAST(SUM(el.qv * s.sv) AS BIGINT) AS dot
        FROM el JOIN s ON el.pos = s.pos GROUP BY 1, 2
    ),
    da AS (
        SELECT d.vec_id, d.label,
               CAST(nl.n AS HUGEINT) * nl.n * xn.xnorm2
                   - 2 * CAST(nl.n AS HUGEINT) * d.dot
                   + s2.snorm2 AS a,
               nl.n AS n
        FROM dots d
        JOIN nl ON nl.label = d.label
        JOIN s2 ON s2.label = d.label
        JOIN xn ON xn.vec_id = d.vec_id
    ),
    loss AS (
        SELECT a.vec_id, a.label,
               SUM(CASE WHEN CAST(a.a AS HUGEINT) * b.n * b.n
                             > CAST(b.a AS HUGEINT) * a.n * a.n
                          OR (CAST(a.a AS HUGEINT) * b.n * b.n
                              = CAST(b.a AS HUGEINT) * a.n * a.n
                              AND a.label > b.label)
                        THEN 1 ELSE 0 END) AS losses
        FROM da a JOIN da b
          ON a.vec_id = b.vec_id AND a.label <> b.label
        GROUP BY 1, 2
    ),
    pred AS (SELECT vec_id, label AS pred_label FROM loss WHERE losses = 0)
    SELECT v.label, p.pred_label, CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM v JOIN pred p USING (vec_id)
    GROUP BY 1, 2
    """,
)
def centroid_classifier_confusion(spark, sf_dir):
    """Nearest-centroid classification with its full confusion matrix
    — the zero-parameter baseline every embedding-quality audit runs
    ("do the labels cluster at all?"): each vector goes to the label
    whose mean embedding is nearest in Euclidean distance, and the
    (label, predicted) counts expose exactly which classes the
    embedding space separates.

    Exactness at every step: vectors quantize to round(x·100) ints;
    the centroid comparison avoids BOTH the mean division and the
    sqrt by comparing n²·d² = n²|x|² − 2n(x·S) + |S|² (S = label SUM
    vector) cross-multiplied pairwise (A_a·n_b² vs A_b·n_a²,
    DECIMAL(38)/HUGEINT — no float anywhere), and the argmin is a
    pairwise TOURNAMENT: the label with zero losses under
    (value, label) order — total, deterministic, any label set, no
    N-way product blow-up.

    Plan: element explode → (label, pos) centroid partials (map-side
    combined), vector-grain dot/norm aggs, then the tournament on the
    |vecs|×L² pair frame — L is the label DOMAIN (bounded), so the
    whole DAG is linear in vectors. No windows, no UDFs, no
    single-partition exchange."""
    e = t(spark, sf_dir, "embeddings")
    q2 = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * 100).cast("bigint"),
    )
    v = e.select("vec_id", "label", q2.alias("q"))
    el = v.select(
        "vec_id", "label", F.posexplode("q").alias("pos", "qv")
    ).persist()  # shared by centroid, norm, and dot branches
    s = el.groupBy("label", "pos").agg(
        F.sum("qv").cast("bigint").alias("sv")
    )
    nl = v.groupBy("label").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    s2 = s.groupBy("label").agg(
        F.sum(F.col("sv") * F.col("sv")).cast("bigint").alias("snorm2")
    )
    xn = el.groupBy("vec_id").agg(
        F.sum(F.col("qv") * F.col("qv")).cast("bigint").alias("xnorm2")
    )
    dots = (
        el.select("vec_id", "pos", "qv")
        .join(F.broadcast(s), "pos")
        .groupBy("vec_id", "label")
        .agg(F.sum(F.col("qv") * F.col("sv")).cast("bigint").alias("dot"))
    )
    da = (
        dots.join(F.broadcast(nl), "label")
        .join(F.broadcast(s2), "label")
        .join(xn, "vec_id")
        .select(
            "vec_id",
            "label",
            # a = n²|x|² − 2n(x·S) + |S|² carried as DECIMAL(38,0)
            # end-to-end (HUGEINT in the oracle): with q = round(x·100)
            # 64-dim vectors, n²·|x|² ≈ n²·2.3e5 overflows int64 once a
            # label holds ~2-3M vectors — far inside the 100 TB story
            # (r6 advisor). decimal(38,0) is exact to n ≈ 1e8 even
            # through the n⁴-scale cross-multiplied comparison below.
            (
                F.col("n").cast("decimal(38,0)")
                * F.col("n")
                * F.col("xnorm2")
                - F.lit(2)
                * F.col("n").cast("decimal(38,0)")
                * F.col("dot")
                + F.col("snorm2")
            ).alias("a"),
            "n",
        )
        .persist()  # both sides of the tournament self-join
    )
    a, b = da.alias("a"), da.alias("b")
    d38 = lambda c: c.cast("decimal(38,0)")
    lhs = d38(F.col("a.a")) * F.col("b.n") * F.col("b.n")
    rhs = d38(F.col("b.a")) * F.col("a.n") * F.col("a.n")
    loss = (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.label") != F.col("b.label")),
        )
        .groupBy(F.col("a.vec_id").alias("vec_id"), F.col("a.label").alias("label"))
        .agg(
            F.sum(
                (
                    (lhs > rhs)
                    | ((lhs == rhs) & (F.col("a.label") > F.col("b.label")))
                ).cast("int")
            ).alias("losses")
        )
    )
    pred = loss.where(F.col("losses") == 0).select(
        "vec_id", F.col("label").alias("pred_label")
    )
    return v.join(pred, "vec_id").groupBy("label", "pred_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs")
    )
