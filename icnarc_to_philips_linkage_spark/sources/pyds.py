"""Python DataSource (Spark 4 `pyspark.sql.datasource` API) for the
WardWatcher/ICNARC XML export — the S1 scan as a FIRST-CLASS format:

    spark.dataSource.register(WardWatcherXmlDataSource)
    spark.read.format("wardwatcher_xml").option("rowTag", "patient")
         .load("/exports/*.xml")

Why this exists alongside ``sources/xml.py``'s wholeTextFiles path: the
DataSource API gives the XML ingest a real source contract — schema
declared to the planner, one InputPartition PER FILE (the natural
parallelism unit: gzip'd XML isn't splittable, exports are
file-granular), executor-side parsing through the same stdlib
ElementTree routine (``xml.parse_patients``), and ordinary composition
with every reader option the DataFrame API carries. Partition planning
is a driver-side file LISTING only — no data is read at plan time.

The emitted schema matches ``xml.RAW_SCHEMA`` (one map<string,string>
column of CMP code → text), so ``xml.widen_by_cmp`` applies unchanged
downstream of either ingest path.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from icnarc_to_philips_linkage_spark.sources.xml import parse_patients


class _XmlFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WardWatcherXmlReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wardwatcher_xml requires a path (.load(path))")
        self.row_tag = options.get("rowtag", "patient")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(glob.glob(os.path.join(self.path, "*.xml")))
        else:
            # glob of a literal existing file returns [that file], so a
            # bare-path typo correctly falls through to the plan-time
            # error below instead of failing executor-side in read()
            files = sorted(glob.glob(self.path))
        if not files:
            raise ValueError(f"no XML files match {self.path!r}")
        return [_XmlFilePartition(f) for f in files]

    def read(self, partition: _XmlFilePartition):
        with open(partition.path, encoding="utf-8") as f:
            text = f.read()
        for rec in parse_patients(text, row_tag=self.row_tag):
            yield (rec,)


class WardWatcherXmlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wardwatcher_xml"

    def schema(self) -> str:
        return "cmp map<string,string>"

    def reader(self, schema) -> WardWatcherXmlReader:
        return WardWatcherXmlReader(self.options)


def register(spark) -> None:
    """Idempotent format registration for the session."""
    spark.dataSource.register(WardWatcherXmlDataSource)
