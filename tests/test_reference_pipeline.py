"""Golden end-to-end tests of the reference-shaped pipeline (SURVEY §5):
inline fixtures built to FIXTURES.md's schemas + quirks, asserting the
invariants the reference prints (counts, uniqueness, LOS conservation,
null residuals) and the corrected-bug semantics."""

from __future__ import annotations

import datetime as dt

import pytest

# end-to-end reference-parity pipelines: the heavy lane
pytestmark = pytest.mark.slow
from pyspark.sql import Row
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators import clean, dedup, derive, link


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def icnarc(spark):
    # FIXTURES.md §1: cardiac rows, null link key, duplicate link key,
    # one wrong id (9001) corrected via the WW sheet to 102.
    rows = [
        Row(**{"ICNARC number": 1, "Unit ID": 1, "CIS Patient ID": 101,
               "CIS Episode ID": 1, "Readmission during this hospital stay": "No", "Key": 11}),
        Row(**{"ICNARC number": 2, "Unit ID": 1, "CIS Patient ID": 9001,
               "CIS Episode ID": 1, "Readmission during this hospital stay": None, "Key": 12}),
        Row(**{"ICNARC number": 3, "Unit ID": 14, "CIS Patient ID": 103,
               "CIS Episode ID": 1, "Readmission during this hospital stay": "No", "Key": 13}),
        Row(**{"ICNARC number": 4, "Unit ID": 1, "CIS Patient ID": None,
               "CIS Episode ID": 1, "Readmission during this hospital stay": "No", "Key": 14}),
        Row(**{"ICNARC number": 5, "Unit ID": 1, "CIS Patient ID": 105,
               "CIS Episode ID": 1, "Readmission during this hospital stay": "No", "Key": 15}),
        Row(**{"ICNARC number": 6, "Unit ID": 1, "CIS Patient ID": 105,
               "CIS Episode ID": 2, "Readmission during this hospital stay": "Yes", "Key": 16}),
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def ww_errors(spark):
    rows = [
        Row(**{"ICNARC Number": 2, "Unit ID": 1, "Corrected encID": 102}),
        Row(**{"ICNARC Number": 99, "Unit ID": 1, "Corrected encID": 999}),  # no match
        Row(**{"ICNARC Number": 3, "Unit ID": 14, "Corrected encID": 888}),  # cardiac, excluded
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def philips(spark):
    # FIXTURES.md §2: 202/202b are fragments of one stay whose ids the
    # issue list corrects to 102; null gender on one row.
    rows = [
        Row(encounterId=101, ptCensusId=1, age=50, inTime=ts("2016-01-01T10:00"),
            outTime=ts("2016-01-05T10:00"), tNumber="T1",
            **{"lengthOfStay (mins)": 5760.0}, gender="Male"),
        Row(encounterId=202, ptCensusId=2, age=61, inTime=ts("2016-02-01T08:00"),
            outTime=ts("2016-02-02T08:00"), tNumber="T2",
            **{"lengthOfStay (mins)": 1440.0}, gender=None),
        Row(encounterId=203, ptCensusId=3, age=60, inTime=ts("2016-02-02T08:00"),
            outTime=ts("2016-02-03T20:00"), tNumber="T2",
            **{"lengthOfStay (mins)": 2160.0}, gender="Female"),
        Row(encounterId=105, ptCensusId=4, age=44, inTime=ts("2016-03-10T12:00"),
            outTime=ts("2016-03-12T12:00"), tNumber="T4",
            **{"lengthOfStay (mins)": 2880.0}, gender="Female"),
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def enc_errors(spark):
    rows = [
        Row(encounterId_CIS=202, encounterId_Adjusted=102,
            clinicalUnitId=1.0, Explanation="split stay"),
        Row(encounterId_CIS=203, encounterId_Adjusted=102,
            clinicalUnitId=1.0, Explanation=None),
        Row(encounterId_CIS=105, encounterId_Adjusted=777,
            clinicalUnitId=8.0, Explanation="excluded unit"),  # filtered (F1)
        Row(encounterId_CIS=55555, encounterId_Adjusted=None,
            clinicalUnitId=1.0, Explanation="keep original"),  # no match
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def cleaned(spark, icnarc, ww_errors, philips, enc_errors):
    i = clean.clean_icnarc_cis_ids(icnarc, ww_errors)
    p = clean.clean_philips_encounterids(philips, enc_errors)
    p = dedup.combine_non_unique_philips_encounters(p, mode="concat")
    linked = link.join_icnarc_to_philips(i, p)
    return i, p, linked


def test_icnarc_clean(spark, icnarc, ww_errors, cleaned):
    i, _, _ = cleaned
    rows = {r["ICNARC number"]: r for r in i.collect()}
    assert 3 not in rows, "cardiac unit rows must be filtered (F1)"
    assert rows[2]["CIS Patient ID"] == 102, "J7 correction must fire"
    assert rows[2]["CIS Patient ID Original"] == 9001
    assert rows[1]["CIS Patient ID"] == 101, "uncorrected rows keep original"
    assert rows[4]["CIS Patient ID"] is None, "null keys stay null"


def test_icnarc_clean_strict_parity_reproduces_bug(spark, icnarc, ww_errors):
    i = clean.clean_icnarc_cis_ids(icnarc, ww_errors, strict_parity=True)
    rows = {r["ICNARC number"]: r for r in i.collect()}
    assert rows[2]["CIS Patient ID"] == 9001, (
        "parity mode: the reference's Series-index membership bug means "
        "corrections never fire"
    )


def test_philips_clean_and_dedup(spark, cleaned):
    _, p, _ = cleaned
    rows = {r["encounterId"]: r for r in p.collect()}
    # fragments 202+203 merged under corrected id 102
    assert set(rows) == {101, 102, 105}
    merged = rows[102]
    assert merged["inTime"] == ts("2016-02-01T08:00"), "min inTime"
    assert merged["outTime"] == ts("2016-02-03T20:00"), "max outTime"
    assert merged["lengthOfStay (mins)"] == 3600.0, "summed LOS (A1 sum)"
    assert merged["age"] == 60, "min age"
    assert merged["error_type"] == "split stay", "first non-'NA' error (UD1)"
    assert merged["encounterId_original_count"] == 2
    assert merged["encounterId_original_list"] == [202, 203]
    # 105: issue-list row excluded by clinicalUnitId==8 → id unchanged
    assert rows[105]["error_type"] == "NA"


def test_core_linkage_and_validation(spark, cleaned):
    i, p, linked = cleaned
    got = {r["encounterId"]: r for r in linked.collect()}
    # 101 links; corrected 102 links; 105 links twice (two ICNARC episodes)
    assert sorted(got) == [101, 102, 105]
    assert linked.count() == 4
    assert "CIS Patient ID" not in linked.columns, "P2 drop"
    assert "Key" not in linked.columns
    report = clean.validation_report(i, p, linked).collect()[0]
    assert report["icnarc_rows"] == 5
    assert report["icnarc_null_keys"] == 1
    assert report["philips_rows"] == 3
    assert report["linked_rows"] == 4


def test_post_link_dedup_one_row_per_stay(spark, cleaned):
    i, p, linked = cleaned
    merged = dedup.combine_non_unique_encounters(linked, mode="concat")
    assert merged.count() == 3
    chk = dedup.uniqueness_check(merged, ["CIS Patient ID Original"]).collect()[0]
    assert chk["is_unique"]
    stay_105 = {r["CIS Patient ID Original"]: r for r in merged.collect()}[105]
    assert stay_105["ICNARC number_count"] == 2
    assert sorted(stay_105["ICNARC number_list"]) == [5, 6]


def test_los_sum_conserved_across_dedup(spark, philips, enc_errors):
    """Property (SURVEY §5.4): dedup-merge conserves total LOS."""
    p = clean.clean_philips_encounterids(philips, enc_errors)
    before = p.agg(F.sum("`lengthOfStay (mins)`")).collect()[0][0]
    after = (
        dedup.combine_non_unique_philips_encounters(p)
        .agg(F.sum("`lengthOfStay (mins)`"))
        .collect()[0][0]
    )
    assert before == after


@pytest.fixture(scope="module")
def wide_cmp(spark):
    rows = [
        Row(**{
            "ICNARC number": 1, "Unit ID": 1, "Sex": "F",
            "Date of Birth": "1966-01-01",
            "Height in cm": "170", "Weight in kg": "68",
            "Date of admission to your unit": "2016-01-01",
            "Time of admission to your unit": "10:00",
            "Date of discharge from your unit": "2016-01-05",
            "Time of discharge from your unit": "10:00",
            "Date body removed from your unit": None,
            "Time body removed from your unit": None,
            "Status at discharge from your unit": "A",
            "Status at discharge from your hospital": "A",
            "Status at ultimate discharge from hospital": "A",
        }),
        Row(**{
            # died in unit: no discharge datetime, body-removed set (E3)
            "ICNARC number": 2, "Unit ID": 1, "Sex": None,
            "Date of Birth": "1950-06-15",
            "Height in cm": "not recorded", "Weight in kg": "80",
            "Date of admission to your unit": "2016-02-01",
            "Time of admission to your unit": "08:00",
            "Date of discharge from your unit": None,
            "Time of discharge from your unit": None,
            "Date body removed from your unit": "2016-02-03",
            "Time body removed from your unit": "20:00",
            "Status at discharge from your unit": "D",
            "Status at discharge from your hospital": None,
            "Status at ultimate discharge from hospital": None,
        }),
        Row(**{
            # all three statuses null (E4 residual path — engine yields NULL)
            "ICNARC number": 5, "Unit ID": 1, "Sex": "F",
            "Date of Birth": "1972-03-03",
            "Height in cm": "160", "Weight in kg": "55",
            "Date of admission to your unit": "2016-03-10",
            "Time of admission to your unit": "12:00",
            "Date of discharge from your unit": "2016-03-12",
            "Time of discharge from your unit": "12:00",
            "Date body removed from your unit": None,
            "Time body removed from your unit": None,
            "Status at discharge from your unit": None,
            "Status at discharge from your hospital": None,
            "Status at ultimate discharge from hospital": None,
        }),
    ]
    return spark.createDataFrame(rows)


def test_derive_stage(spark, wide_cmp):
    df = derive.combine_date_time_columns(
        wide_cmp,
        ["Date of admission to your unit",
         "Date of discharge from your unit",
         "Date body removed from your unit"],
    )
    assert "Datetime of admission to your unit" in df.columns
    assert "Date of admission to your unit" not in df.columns
    df = derive.derive_icnarc_outtime(df)
    df = derive.derive_mortality(df)
    df = derive.derive_outcomes(df)
    rows = {r["ICNARC number"]: r for r in df.collect()}
    # E3: discharge → outTime for survivor, body-removed for death
    assert rows[1]["icnarc_outTime"] == ts("2016-01-05T10:00")
    assert rows[2]["icnarc_outTime"] == ts("2016-02-03T20:00")
    # E4: cascade picks ultimate, falls back to unit status; all-null → NULL
    assert rows[1]["mortality_status"] == "A"
    assert rows[2]["mortality_status"] == "D"
    assert rows[5]["mortality_status"] is None
    # E7: LOS minutes
    assert rows[1]["icnarc_los"] == 4 * 24 * 60
    assert rows[2]["icnarc_los"] == pytest.approx(2 * 24 * 60 + 12 * 60)
    # E6: age ≈ 50.0 years
    assert rows[1]["icnarc_age"] == pytest.approx(50.0, abs=0.1)
    # E8: parity sex recode sends NULL → 'Male'
    assert rows[1]["icnarc_gender"] == "Female"
    assert rows[2]["icnarc_gender"] == "Male"
    # E9: BMI; unparseable height coerces to NULL → NULL BMI (E11)
    assert rows[1]["bmi"] == pytest.approx(68 / 1.70**2, rel=1e-6)
    assert rows[2]["bmi"] is None


def test_unit_decode(spark):
    df = spark.createDataFrame(
        [Row(**{"ICNARC Number": "7", "ICNARC CMP Number": "H91"}),
         Row(**{"ICNARC Number": "8", "ICNARC CMP Number": "B16"})]
    )
    out = derive.convert_unit_numbers(df)
    rows = {r["ICNARC number"]: r["Unit ID"] for r in out.collect()}
    assert rows == {7: 1, 8: 14}
    assert "ICNARC CMP Number" not in out.columns


@pytest.fixture(scope="module")
def chartevents(spark):
    rows = [
        # numeric-valued attribute
        Row(encounterId=101, chartTime=ts("2016-01-01T11:00"),
            storeTime=ts("2016-01-01T11:05"), interventionId=3363,
            attributeId=629, valueNumber=72.0, valueString=None),
        Row(encounterId=101, chartTime=ts("2016-01-01T12:00"),
            storeTime=ts("2016-01-01T12:02"), interventionId=3363,
            attributeId=629, valueNumber=75.0, valueString=None),
        # string-valued attribute (16240 ∈ E10 string set)
        Row(encounterId=102, chartTime=ts("2016-02-01T09:00"),
            storeTime=ts("2016-02-01T09:30"), interventionId=5132,
            attributeId=16240, valueNumber=None, valueString="Intubated"),
        # event outside the cohort
        Row(encounterId=999, chartTime=ts("2016-05-01T09:00"),
            storeTime=ts("2016-05-01T09:01"), interventionId=3363,
            attributeId=629, valueNumber=60.0, valueString=None),
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def interventions_key(spark):
    return spark.createDataFrame(
        [Row(Variable="Heart Rate", interventionId=3363, attributeId=629),
         Row(Variable="Airway", interventionId=5132, attributeId=16240)]
    )


def test_chartevents_path(spark, chartevents, interventions_key, cleaned):
    from icnarc_to_philips_linkage_spark.functions.expressions import typed_value

    _, p, _ = cleaned
    cohort = p.select("encounterId")
    semi = link.cohort_restrict(chartevents, cohort, mode="semi")
    assert {r.encounterId for r in semi.collect()} == {101, 102}
    assert semi.count() == 3

    right = link.cohort_restrict(chartevents, cohort, mode="right")
    # strict parity: cohort member 105 with zero events yields a null row
    assert right.count() == 4
    null_rows = right.filter(F.col("chartTime").isNull()).collect()
    assert [r.encounterId for r in null_rows] == [105]

    decorated = link.decorate_events(
        semi.withColumn(
            "value",
            typed_value("attributeId", [16240, 6847], "valueString", "valueNumber"),
        ),
        interventions_key,
    )
    got = {(r.encounterId, r.Variable): r.value for r in decorated.collect()}
    assert got[(102, "Airway")] == "Intubated", "E10 picks valueString"
    assert got[(101, "Heart Rate")] in {"72.0", "75.0"}, "E10 casts valueNumber"
