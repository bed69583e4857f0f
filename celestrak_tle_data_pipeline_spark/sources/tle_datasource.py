"""Custom Python DataSource (Spark 4): ``spark.read.format("tle")``.

The landing zone's raw TLE text becomes a first-class Spark source —
``spark.read.format("tle").load(landing_dir)`` yields one row per
assembled triple, with the SAME whitespace/stride semantics as the
expression path (``operators/assembly.py:assemble_from_payloads``,
mirroring reference script.py:119,124-127: payload strip, per-line
strip, trailing incomplete triple dropped).

Why both paths exist: the expression path is the production default
(whole-stage codegen over ``spark.read.text`` payload rows). This
DataSource certifies the Spark 4 Python DataSource API as a *sources*
capability — useful where assembly must happen before Spark sees rows
(e.g. a future binary or compressed container format that line-based
``spark.read.text`` cannot split), while keeping the scale contract:

- ``partitions()`` returns ONE InputPartition PER LANDED FILE, so a
  1000-executor cluster fans file reads out exactly like the built-in
  file sources (no driver-side read; the driver only globs names);
- ``read()`` runs on executors and streams triples per file — memory
  is bounded by one payload, not the landing zone.

Registered lazily via ``register_tle_source(spark)`` (idempotent).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

SCHEMA = (
    "source_file string, sat_name_raw string, line1 string, line2 string"
)


class TleFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def iter_triples(payload: str):
    """(stripped) payload text → (sat_name_raw, line1, line2) triples.
    Exact twin of the Catalyst assembly expressions: strip the payload,
    strip each line, emit floor(n/3) stride-3 triples."""
    lines = [ln.strip() for ln in payload.strip().split("\n")]
    for i in range(len(lines) // 3):
        yield lines[3 * i], lines[3 * i + 1], lines[3 * i + 2]


class TleReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("format('tle') requires .load(<path>)")

    def partitions(self):
        # one partition per landed file — file-granular parallelism,
        # names only (no payload bytes touch the driver)
        if os.path.isdir(self.path):
            files = sorted(glob.glob(os.path.join(self.path, "*")))
        else:
            files = sorted(glob.glob(self.path))
        files = [f for f in files if os.path.isfile(f)]
        return [TleFilePartition(f) for f in files]

    def read(self, partition):
        with open(partition.path, encoding="utf-8") as f:
            payload = f.read()
        if len(payload.strip().split("\n")) < 3:
            return  # empty/short payload gates out, like the guard
        for name, l1, l2 in iter_triples(payload):
            yield partition.path, name, l1, l2


class TleDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tle"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return TleReader(self.options)


def register_tle_source(spark) -> None:
    """Idempotent registration of the 'tle' format on this session."""
    spark.dataSource.register(TleDataSource)
