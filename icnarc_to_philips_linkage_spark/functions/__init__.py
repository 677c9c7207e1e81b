from icnarc_to_philips_linkage_spark.functions.expressions import (
    age_years,
    coalesce_cascade,
    combine_date_time,
    decimal_sum,
    decode_map,
    duration_minutes,
    minutes_to_days,
    minutes_to_hours,
    seconds_of_day,
    typed_value,
)

__all__ = [
    "age_years",
    "coalesce_cascade",
    "combine_date_time",
    "decimal_sum",
    "decode_map",
    "duration_minutes",
    "minutes_to_days",
    "minutes_to_hours",
    "seconds_of_day",
    "typed_value",
]
