"""DateMathParser + DateTools semantics."""

from datetime import datetime

import pytest

from lucene_solr_old_spark.functions.datemath import (datetools_string,
                                                      parse_date_math)

NOW = datetime(2024, 3, 15, 10, 30, 45, 123456)


@pytest.mark.parametrize("expr,expected", [
    ("NOW", NOW),
    ("NOW/DAY", datetime(2024, 3, 15)),
    ("NOW/HOUR", datetime(2024, 3, 15, 10)),
    ("NOW/DAY-7DAYS", datetime(2024, 3, 8)),
    ("NOW+2HOURS", datetime(2024, 3, 15, 12, 30, 45, 123456)),
    ("NOW-1YEAR/MONTH", datetime(2023, 3, 1)),
    ("NOW/MINUTE+30SECONDS", datetime(2024, 3, 15, 10, 30, 30)),
    ("2024-01-31T00:00:00+1MONTH", datetime(2024, 2, 29)),  # clamp like Calendar
    ("2024-01-15T10:30:00Z/HOUR+30MINUTES", datetime(2024, 1, 15, 10, 30)),
    ("NOW+DAY", datetime(2024, 3, 16, 10, 30, 45, 123456)),  # implicit 1
])
def test_date_math(expr, expected):
    assert parse_date_math(expr, NOW) == expected


def test_bad_expressions():
    with pytest.raises(ValueError):
        parse_date_math("NOW/3DAYS", NOW)  # rounding takes no number
    with pytest.raises(ValueError):
        parse_date_math("NOW+2FORTNIGHTS", NOW)


def test_datetools_string_sortable(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(datetime(2024, 3, 15, 10, 30, 45),),
         (datetime(2023, 12, 1, 23, 59, 59),)], "ts TIMESTAMP")
    got = sorted(r[0] for r in df.select(
        datetools_string(F.col("ts"), "second").alias("s")).collect())
    assert got == ["20231201235959", "20240315103045"]
    day = {r[0] for r in df.select(
        datetools_string(F.col("ts"), "day").alias("s")).collect()}
    assert day == {"20240315", "20231201"}
