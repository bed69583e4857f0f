"""JDBC source/sink round-trip (SURVEY.md §2.1 S3-S5, S9).

The reference reads dim/fact key probes over a DB connection
(``pd.read_sql``, script.py:85/141/159) and appends with
``chunksize=1000`` (script.py:171). The engine's primary sink is the
parquet warehouse, but the same API surface must ride ``spark.read/
write.jdbc`` when the warehouse IS a database — exercised here against
embedded Derby (in the Spark distribution; no external server), with
``batchsize=1000`` as the chunked-append analog.

Scale notes encoded in the assertions:
- the key probe pushes its predicate INTO the JDBC scan (PushedFilters
  on the JDBCRelation — the DB does the filtering, Spark never ships
  the table);
- the partitioned read (partitionColumn/bounds/numPartitions) splits
  the table into range-disjoint queries — the parallel-ingest shape a
  1000-executor cluster uses against a sharded source.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from celestrak_tle_data_pipeline_spark.sources.tables import load_table

from conftest import SF_DIR

_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _props():
    return {"driver": _DRIVER, "batchsize": "1000"}


def test_jdbc_write_read_roundtrip(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/wh;create=true"
    dim = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    dim.write.jdbc(url, "dim_customer", mode="overwrite", properties=_props())

    back = spark.read.jdbc(url, "dim_customer", properties=_props())
    assert back.count() == dim.count()
    # column-for-column equality, order-free
    assert back.exceptAll(dim).isEmpty() and dim.exceptAll(back).isEmpty()


def test_jdbc_key_probe_pushes_predicate(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/probe;create=true"
    dim = load_table(spark, SF_DIR, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    dim.write.jdbc(url, "dim_nation", mode="overwrite", properties=_props())

    probe = (
        spark.read.jdbc(url, "dim_nation", properties=_props())
        .where(F.col("n_regionkey") == 1)
        .select("n_nationkey")
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "N_REGIONKEY" in plan.upper()
    expected = {
        r[0]
        for r in dim.where(F.col("n_regionkey") == 1)
        .select("n_nationkey")
        .collect()
    }
    assert {r[0] for r in probe.collect()} == expected


def test_jdbc_partitioned_parallel_read(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/par;create=true"
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    orders.write.jdbc(url, "fact_orders", mode="overwrite", properties=_props())

    lo, hi = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).first()
    par = spark.read.jdbc(
        url,
        "fact_orders",
        column="o_orderkey",
        lowerBound=lo,
        upperBound=hi + 1,
        numPartitions=4,
        properties=_props(),
    )
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == orders.count()
    # range splits are disjoint and complete: no dup, no loss
    assert par.select("o_orderkey").distinct().count() == orders.count()
