"""EP1/EP3 composite pipelines through the public API, reusing the
golden fixtures (EP2 is covered by test_sources + test_reference_pipeline
derive tests)."""

from __future__ import annotations

from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark import pipelines
from tests.test_reference_pipeline import (  # noqa: F401 (fixtures)
    chartevents,
    enc_errors,
    icnarc,
    interventions_key,
    philips,
    ww_errors,
)


def test_linkage_pipeline_end_to_end(spark, icnarc, philips, ww_errors, enc_errors):
    out = pipelines.run_linkage_pipeline(icnarc, philips, ww_errors, enc_errors)
    assert out["icustays"].count() == 3
    v = out["validation"].collect()[0]
    assert v["linked_rows"] == 4
    # the whole chain is one lazy DAG: icustays plan contains no
    # materialization barriers the user didn't ask for
    stays = {r["CIS Patient ID Original"] for r in out["icustays"].collect()}
    assert stays == {101, 9001, 105}


def test_chartevents_pipeline_end_to_end(
    spark, chartevents, interventions_key, philips, enc_errors, ww_errors, icnarc
):
    linkage = pipelines.run_linkage_pipeline(
        icnarc, philips, ww_errors, enc_errors
    )
    cohort = linkage["philips_merged"].select("encounterId")
    assessments = chartevents.filter(F.col("attributeId") != 16240)
    labs = chartevents.filter(F.col("attributeId") == 16240)
    out = pipelines.run_chartevents_pipeline(
        assessments, labs, cohort, interventions_key
    )
    rows = out.collect()
    assert {r.encounterId for r in rows} == {101, 102}
    by_var = {r.Variable for r in rows}
    assert by_var == {"Heart Rate", "Airway"}
    airway = [r for r in rows if r.Variable == "Airway"][0]
    assert airway.value == "Intubated"
