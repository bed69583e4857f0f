"""UDAF / UDTF surface (SURVEY.md §2.10) — exercised under the oracle
gate.

The engine's position (SURVEY §2.10) stands: nothing in the reference
NEEDS a Python UDF — the parse bundle is pure Catalyst expressions.
These two queries exist to prove the *surface* works end-to-end at the
engine's determinism bar, the same way the multimodal kernels prove the
Arrow plumbing:

- a grouped-aggregate ``pandas_udf`` (the Python UDAF path: Arrow
  batches in, one scalar out per group), kept bit-reproducible by
  doing ALL arithmetic in int64 and converting to double only in the
  final division — the same exact-integer discipline the decimal power
  sums use;
- a Python UDTF (one row in → many typed rows out) via ``F.udtf`` and
  a ``LATERAL`` join, the Spark-4 shape of the reference's
  record-expanding ``parse_tle_pair`` (script.py:22-59).

Scale notes: the UDAF ships one Arrow batch per group partition and
returns 8 bytes per group (mergeable it is NOT — Spark evaluates
grouped-agg pandas UDFs without partial aggregation, so the shuffle
carries raw group rows; use it only where no built-in composition
exists — the expression twin is always preferred). The UDTF is
row-at-a-time Python — surface demo, deliberately bounded to a
sampled slice; the production path for n-grams is the higher-order
``transform`` used everywhere else in ``ext_text``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import register
from .common import t


# --------------------------------------------------------------------------
# grouped-agg pandas UDAF: Gini concentration of quantities per flag
# --------------------------------------------------------------------------
@register(
    "udaf_gini_quantity",
    oracle="""
    WITH r AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS q,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY CAST(l_quantity AS BIGINT)
               ) AS i
        FROM lineitem
    ),
    s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(i * q) AS s1,
               SUM(q) AS s0
        FROM r GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           n AS n_rows,
           (2 * s1 - (n + 1) * s0)::DOUBLE / ((n * s0)::DOUBLE) AS gini
    FROM s
    """,
)
def udaf_gini_quantity(spark, sf_dir):
    """Gini coefficient of l_quantity per return flag via a
    grouped-aggregate ``pandas_udf`` — the Python UDAF surface under
    the value gate. Deterministic because every intermediate is int64
    (sort → Σi·q and Σq are permutation-invariant within ties: equal
    q share any assignment of tied ranks) and the single double
    division at the end is IEEE-identical in both engines. int64
    bounds: Σi·q ~ n²·q̄/2 — fine to ~1e9 rows/group; beyond that use
    the SQL window twin (the oracle text IS that twin).

    Type objects, not DDL strings, for the return type — string-typed
    pandas_udf crashes on executor re-import (see project notes)."""

    @F.pandas_udf(T.DoubleType())
    def gini(v: pd.Series) -> float:
        x = np.sort(v.to_numpy(np.int64))
        n = x.size
        i = np.arange(1, n + 1, dtype=np.int64)
        s1 = int(np.dot(i, x))
        s0 = int(x.sum())
        return float((2 * s1 - (n + 1) * s0) / (n * s0))

    l = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("q")
    )
    # Spark disallows mixing a grouped-agg pandas UDF with JVM
    # aggregates in one agg(); the count rides a separate (tiny,
    # broadcast) aggregation joined back on the group key.
    counts = l.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_rows"))
    ginis = l.groupBy("l_returnflag").agg(gini("q").alias("gini"))
    return counts.join(F.broadcast(ginis), "l_returnflag").select(
        "l_returnflag", "n_rows", "gini"
    )


# --------------------------------------------------------------------------
# Python UDTF: typed one-to-many row expansion via LATERAL
# --------------------------------------------------------------------------
@register(
    "udtf_ngram_expand",
    oracle="""
    WITH sampled AS (
        SELECT doc_id, string_split(text, ' ') AS s
        FROM documents WHERE doc_id % 25 = 0
    ),
    g AS (
        SELECT doc_id,
               unnest([array_to_string(s[i:i+2], ' ')
                       for i in range(1, len(s) - 1)]) AS ngram
        FROM sampled
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ngrams,
           CAST(COUNT(DISTINCT ngram) AS BIGINT) AS n_distinct
    FROM g GROUP BY doc_id
    """,
)
def udtf_ngram_expand(spark, sf_dir):
    """Word-trigram expansion through a Python UDTF + LATERAL join —
    the one-row-in/many-typed-rows-out surface (the Spark-4 analog of
    the reference's record-expanding parse, script.py:22-59), then an
    aggregation that the oracle reproduces relationally. Row-at-a-time
    Python by nature, so the input is a sampled slice and the
    production n-gram path remains the higher-order ``transform``
    (ext_text) — this query certifies the API plumbing, not a hot
    path."""

    @F.udtf(returnType="ngram: string")
    class NGrams:
        def eval(self, text: str):  # noqa: D102 — UDTF contract method
            toks = text.split(" ")
            for i in range(len(toks) - 2):
                yield (" ".join(toks[i : i + 3]),)

    spark.udtf.register("tri_grams", NGrams)
    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    docs.createOrReplaceTempView("udtf_docs_sampled")
    return spark.sql(
        """
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_ngrams,
               CAST(COUNT(DISTINCT g.ngram) AS BIGINT) AS n_distinct
        FROM udtf_docs_sampled, LATERAL tri_grams(text) AS g
        GROUP BY doc_id
        """
    )


# --------------------------------------------------------------------------
# mapInArrow: zero-copy Arrow batch transform
# --------------------------------------------------------------------------
@register(
    "arrow_batch_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def arrow_batch_token_stats(spark, sf_dir):
    """Per-document token/char counts computed INSIDE Arrow record
    batches via ``mapInArrow`` — the third Python-kernel surface next
    to mapInPandas (multimodal) and pandas_udf (UDAF): no pandas
    conversion at all, just ``pyarrow.compute`` calls on the columnar
    buffers. The kernel is exact integer counting on the same
    single-space tokenization the oracle's ``string_split`` uses, so
    the gate is bit-for-bit.

    Scale shape: Arrow batches stream through the Python worker with
    zero-copy columnar transfer and vectorized compute — the preferred
    shape when a kernel genuinely needs Python but the data is large;
    still slower than staying JVM-side (the expression twin is
    ``token_count_regex``), so production paths default to
    expressions and this certifies the plumbing."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for b in batches:
            text = b.column("text")
            toks = pc.list_value_length(
                pc.split_pattern(text, pattern=" ")
            ).cast(pa.int64())
            yield pa.RecordBatch.from_arrays(
                [b.column("doc_id"), toks,
                 pc.utf8_length(text).cast(pa.int64())],
                ["doc_id", "n_tokens", "n_chars"],
            )

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        kernel, "doc_id bigint, n_tokens bigint, n_chars bigint"
    )


# --------------------------------------------------------------------------
# Python UDTF with analyze(): schema decided from the call site
# --------------------------------------------------------------------------
@register(
    "udtf_dynamic_split_fields",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS f1,
           string_split(text, ' ')[2] AS f2,
           string_split(text, ' ')[3] AS f3
    FROM documents WHERE doc_id % 25 = 0
    """,
)
def udtf_dynamic_split_fields(spark, sf_dir):
    """Dynamic-schema Python UDTF (Spark 4 ``analyze()``): the output
    columns f1..fN do not exist until the CALL SITE — ``analyze`` reads
    the constant N argument at plan time and manufactures the schema,
    the dispatch every fixed-width splitter wants (the reference's
    12-field TLE slice, script.py:24-40, is exactly this shape: one
    line in, N typed fields out, N known per format). eval() then
    emits one N-field row per input. Certifies the analyze-time
    contract: a non-constant N is a PLANNING error, not a runtime
    surprise."""
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @F.udtf
    class SplitFields:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument):
            if not n.isConstantExpression:
                raise ValueError("n must be a constant")
            width = int(n.value)
            return AnalyzeResult(
                schema=T.StructType(
                    [
                        T.StructField(f"f{i + 1}", T.StringType())
                        for i in range(width)
                    ]
                )
            )

        def eval(self, text: str, n: int):
            toks = text.split(" ")
            yield tuple(
                toks[i] if i < len(toks) else None for i in range(n)
            )

    spark.udtf.register("split_fields", SplitFields)
    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    docs.createOrReplaceTempView("udtf_split_docs")
    return spark.sql(
        """
        SELECT doc_id, s.f1, s.f2, s.f3
        FROM udtf_split_docs, LATERAL split_fields(text, 3) AS s
        """
    )
