"""Additive schema evolution on the parquet warehouse
(ParquetWarehouse.evolve + catalog-spec schema-on-read).

Pins: pre-evolve files null-fill added columns at read time with NO
footer merging (the read plan carries the catalog schema), post-evolve
appends carry values, non-additive evolutions (drop / retype /
non-nullable add) are rejected, and the evolved table keeps working
through the ordinary append path.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from celestrak_tle_data_pipeline_spark.sinks.warehouse import ParquetWarehouse

V1 = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("lang", T.StringType(), True),
    ]
)
V2 = T.StructType(
    list(V1.fields)
    + [T.StructField("quality", T.DoubleType(), True)]
)


def test_evolve_null_fills_old_files(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.ensure("docs", V1)
    wh.append(
        "docs",
        spark.createDataFrame([(1, "en"), (2, "de")], V1),
    )

    added = wh.evolve("docs", V2)
    assert added == ["quality"]

    # old files scan under the NEW schema, null-filled — and the scan
    # schema comes from the catalog spec, not footer merging
    df = wh.read("docs")
    assert df.schema["quality"].dataType == T.DoubleType()
    assert {
        (r.doc_id, r.lang, r.quality) for r in df.collect()
    } == {(1, "en", None), (2, "de", None)}

    # post-evolve appends carry the new column; both generations coexist
    wh.append(
        "docs",
        spark.createDataFrame([(3, "fr", 0.9)], V2),
    )
    got = {
        (r.doc_id, r.lang, r.quality) for r in wh.read("docs").collect()
    }
    assert got == {(1, "en", None), (2, "de", None), (3, "fr", 0.9)}

    # the evolved column is queryable through the catalog too
    n = spark.sql(
        "SELECT count(*) FROM `docs` WHERE quality IS NOT NULL"
    ).first()[0]
    assert n == 1


def test_non_additive_evolutions_rejected(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh2"))
    wh.ensure("docs2", V1)

    with pytest.raises(ValueError, match="drop"):
        wh.evolve(
            "docs2",
            T.StructType([T.StructField("doc_id", T.LongType(), False)]),
        )
    with pytest.raises(ValueError, match="types"):
        wh.evolve(
            "docs2",
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType(), False),
                    T.StructField("lang", T.LongType(), True),
                ]
            ),
        )
    with pytest.raises(ValueError, match="nullable"):
        wh.evolve(
            "docs2",
            T.StructType(
                list(V1.fields)
                + [T.StructField("quality", T.DoubleType(), False)]
            ),
        )
    with pytest.raises(FileNotFoundError):
        wh.evolve("never_ensured", V1)


def test_spec_read_prunes_to_catalog_schema(spark, tmp_path):
    """The spec-enforced read plan reads the registered columns only —
    ReadSchema in the scan matches the catalog, so column pruning and
    pushdown behave as before evolution."""
    wh = ParquetWarehouse(spark, str(tmp_path / "wh3"))
    wh.ensure("docs3", V1)
    wh.append(
        "docs3", spark.createDataFrame([(1, "en")], V1)
    )
    plan = (
        wh.read("docs3")
        .where(F.col("doc_id") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,1)]" in plan
