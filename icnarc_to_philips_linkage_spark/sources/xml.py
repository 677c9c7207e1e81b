"""ICNARC WardWatcher XML ingest (SURVEY.md §2.1 S1/S2).

The reference parses the whole export with ElementTree on one machine
(parse_ICNARC_xml.py:27-43): for each ``<patient>`` element, collect
{tag → text} with XML namespaces stripped, then widen to one column per
CMP code present, named by the CMP dimension's Description.

Spark-first design, self-contained (no spark-xml dependency):

- Files parallelize at file granularity: one ICNARC export per task via
  ``wholeTextFiles`` (gzip'd XML isn't splittable anyway; a yearly
  export is tens of MB — the reference ships 4 years in one file). For
  100 TB of XML you have many files, which is exactly the parallelism
  unit used here.
- Parse emits a ``MapType`` column (code → text); the wide projection is
  *schema work*, not data work: the CMP dimension drives a
  select-with-aliases, and code-presence pruning
  (parse_ICNARC_xml.py:47-49) is a map_keys aggregation, not a rescan.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, StructField, StructType

RAW_SCHEMA = StructType(
    [StructField("cmp", MapType(StringType(), StringType()), False)]
)


def _strip_ns(tag: str) -> str:
    """'{namespace}CODE' → 'CODE' (parse_ICNARC_xml.py:35)."""
    return tag.split("}")[-1]


def parse_patients(xml_text: str, row_tag: str = "patient") -> list[dict]:
    """One {code → text} dict per <patient> element. Runs inside
    executors via mapPartitions — ElementTree only, stdlib."""
    root = ET.fromstring(xml_text)
    out = []
    for elem in root.iter():
        if _strip_ns(elem.tag) != row_tag:
            continue
        rec = {
            _strip_ns(child.tag): child.text
            for child in elem
            if child.text is not None and child.text.strip() != ""
        }
        if rec:
            out.append(rec)
    return out


def read_icnarc_xml_raw(
    spark: SparkSession, path: str, row_tag: str = "patient"
) -> DataFrame:
    """S1: distributed XML scan → one row per patient with a
    ``cmp: map<string,string>`` column."""
    files = spark.sparkContext.wholeTextFiles(path)
    rows = files.flatMap(
        lambda kv: [(rec,) for rec in parse_patients(kv[1], row_tag)]
    )
    return spark.createDataFrame(rows, RAW_SCHEMA)


def present_codes(raw: DataFrame) -> list[str]:
    """Codes that occur in at least one record — the reference's
    presence scan (parse_ICNARC_xml.py:47-49) as one distinct-keys
    aggregation."""
    return [
        r.code
        for r in raw.select(
            F.explode(F.map_keys("cmp")).alias("code")
        )
        .distinct()
        .collect()
    ]


def widen_by_cmp(
    raw: DataFrame, cmp_properties: DataFrame, codes: list[str] | None = None
) -> DataFrame:
    """S2: wide-table construction — one column per present CMP code,
    named by the dimension's Description (parse_ICNARC_xml.py:45-62).
    The CMP dimension is tiny (hundreds of rows) and is collected to
    drive column aliasing; absent codes are pruned (schema work only)."""
    mapping = [
        (r["CODE"], r["Description"])
        for r in cmp_properties.select("CODE", "Description").collect()
    ]
    if codes is None:
        codes = present_codes(raw)
    present = set(codes)
    cols = [
        F.col("cmp")[code].alias(desc)
        for code, desc in mapping
        if code in present
    ]
    if not cols:
        raise ValueError("no CMP codes from the dimension are present")
    return raw.select(*cols)


def parse_icnarc_xml(
    spark: SparkSession, path: str, cmp_properties: DataFrame
) -> DataFrame:
    """End-to-end S1+S2: XML → wide string-typed CMP DataFrame (the
    reference's ``parse_icnarc_xml``, parse_ICNARC_xml.py:22-64)."""
    raw = read_icnarc_xml_raw(spark, path)
    return widen_by_cmp(raw, cmp_properties)
