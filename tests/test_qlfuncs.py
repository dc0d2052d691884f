"""QL scalar-function layer (x-pack sql expression/function/scalar
string / datetime / conditional families) — unit semantics, ES|QL EVAL/
WHERE dispatch, SQL SELECT/WHERE integration vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.search.qlfuncs import (
    QlError,
    compile_ql,
    has_ql_function,
)

DF = pd.DataFrame({
    "s": ["hello world", "Spark", "  pad  ", None],
    "k": ["aa", "bb", "cc", "dd"],
    "v": [1.5, -2.0, 3.25, 4.0],
    "ts": pd.to_datetime(["2024-03-15 10:30:45", "2024-07-01 00:00:00",
                          "2023-12-31 23:59:59", "2024-01-01 06:00:00"]),
})


def _ev(expr):
    return compile_ql(expr)(DF)


def _l(x):
    """tolist with pd.NA/NaN normalized to None."""
    return [None if pd.isna(v) else v for v in list(x)]


def test_string_functions():
    assert _ev("UCASE(k)").tolist() == ["AA", "BB", "CC", "DD"]
    assert _ev("LOWER(UCASE(k))").tolist() == ["aa", "bb", "cc", "dd"]
    assert _l(_ev("LENGTH(s)")) == [11, 5, 7, None]
    assert _l(_ev("LEFT(s, 3)")) == ["hel", "Spa", "  p", None]
    assert _l(_ev("RIGHT(s, 2)")) == ["ld", "rk", "  ", None]
    assert _ev("RIGHT(k, 0)").tolist() == ["", "", "", ""]
    assert _l(_ev("TRIM(s)")) == ["hello world", "Spark", "pad", None]
    assert _ev("LTRIM(s)").tolist()[2] == "pad  "
    assert _ev("RTRIM(s)").tolist()[2] == "  pad"
    assert _ev('REPLACE(k, "a", "x")').tolist() == ["xx", "bb", "cc", "dd"]
    assert _ev("REPEAT(k, 2)").tolist() == ["aaaa", "bbbb", "cccc", "dddd"]
    assert _l(_ev("SUBSTRING(s, 7, 5)")) == [
        "world", "", " ", None]  # "  pad  "[6:11] is the trailing space
    assert _ev('CONCAT(k, "-x")').tolist() == ["aa-x", "bb-x", "cc-x",
                                               "dd-x"]
    assert _l(_ev('LOCATE("o", s)')) == [5, 0, 0, None]
    assert _l(_ev('LOCATE("o", s, 6)')) == [8, 0, 0, None]
    assert _ev('INSERT(k, 2, 1, "ZZ")').tolist() == [
        "aZZ", "bZZ", "cZZ", "dZZ"]
    assert _ev("ASCII(k)").tolist() == [97, 98, 99, 100]
    assert compile_ql("CHAR(65)")(DF) == "A"
    assert compile_ql("SPACE(3)")(DF) == "   "
    assert _ev("OCTET_LENGTH(k)").tolist() == [2, 2, 2, 2]
    assert _ev("BIT_LENGTH(k)").tolist() == [16, 16, 16, 16]
    assert _l(_ev('STARTS_WITH(s, "he")')) == [
        True, False, False, None]
    assert _ev('k || "!"').tolist() == ["aa!", "bb!", "cc!", "dd!"]


def test_datetime_functions():
    assert _ev("YEAR(ts)").tolist() == [2024, 2024, 2023, 2024]
    assert _ev("MONTH(ts)").tolist() == [3, 7, 12, 1]
    assert _ev("DAY(ts)").tolist() == [15, 1, 31, 1]
    assert _ev("HOUR(ts)").tolist() == [10, 0, 23, 6]
    assert _ev("MINUTE(ts)").tolist() == [30, 0, 59, 0]
    assert _ev("SECOND(ts)").tolist() == [45, 0, 59, 0]
    assert _ev("QUARTER(ts)").tolist() == [1, 3, 4, 1]
    assert _ev("DAY_OF_YEAR(ts)").tolist() == [75, 183, 365, 1]
    # 2024-03-15 is a Friday: DAY_OF_WEEK (Sunday=1) -> 6, ISO -> 5
    assert _ev("DAY_OF_WEEK(ts)").tolist()[0] == 6
    assert _ev("ISO_DAY_OF_WEEK(ts)").tolist()[0] == 5
    assert _ev('DATE_TRUNC("month", ts)').tolist()[0] == \
        pd.Timestamp("2024-03-01")
    assert _ev('DATE_TRUNC("week", ts)').tolist()[0] == \
        pd.Timestamp("2024-03-11")  # Monday
    assert _ev('DATE_PART("doy", ts)').tolist() == [75, 183, 365, 1]
    assert _ev('DATE_ADD("month", 2, ts)').tolist()[0] == \
        pd.Timestamp("2024-05-15 10:30:45")
    d = compile_ql('DATE_DIFF("day", DATE_TRUNC("year", ts), ts)')(DF)
    assert d.tolist() == [74, 182, 364, 0]


def test_conditional_functions():
    assert _ev('COALESCE(s, "none")').tolist()[3] == "none"
    assert _ev('IFNULL(s, "x")').tolist()[3] == "x"
    assert _l(_ev('NULLIF(k, "bb")')) == ["aa", None, "cc", "dd"]
    assert list(_ev("GREATEST(v, 0)")) == [1.5, 0.0, 3.25, 4.0]
    assert list(_ev("LEAST(v, 2)")) == [1.5, -2.0, 2.0, 2.0]
    assert list(_ev('IIF(v > 2, "hi", "lo")')) == ["lo", "lo", "hi", "hi"]


def test_predicates_and_math_fallthrough():
    assert _ev("LENGTH(k) = 2").tolist() == [True, True, True, True]
    assert _ev("YEAR(ts) == 2024 AND MONTH(ts) < 6").tolist() == [
        True, False, False, True]
    assert _ev("s IS NULL").tolist() == [False, False, False, True]
    assert _ev("s IS NOT NULL").tolist() == [True, True, True, False]
    assert _ev("NOT (v > 0)").tolist() == [False, True, False, False]
    # math names fall through to the lang-expression table
    assert list(_ev("abs(v)")) == [1.5, 2.0, 3.25, 4.0]
    assert list(_ev("floor(v) + 1")) == [2.0, -1.0, 4.0, 5.0]
    with pytest.raises(QlError, match="unknown function"):
        compile_ql("NO_SUCH_FN(v)")


def test_has_ql_function():
    assert has_ql_function("UCASE(k)")
    assert has_ql_function("year(ts) == 2024")
    assert not has_ql_function("v * 2 + 1")
    assert not has_ql_function("lang == \"en\"")


def test_esql_eval_and_where_dispatch(ray_session):
    import ray.data as rd

    from elasticsearch_ray.search.esql import esql

    out = esql(
        'FROM t | WHERE YEAR(ts) == 2024 | '
        'EVAL ku = UCASE(k), yr = YEAR(ts) | '
        'SORT k | KEEP k, ku, yr',
        {"t": rd.from_pandas(DF).repartition(2)}).to_pandas()
    assert out["ku"].tolist() == ["AA", "BB", "DD"]
    assert out["yr"].tolist() == [2024, 2024, 2024]


@pytest.fixture(scope="module")
def sqlf_ds(ray_session):
    import ray.data as rd

    return {"t": rd.from_pandas(DF).repartition(2)}


def _duck(sql):
    con = duckdb.connect()
    con.register("t", DF)
    return con.execute(sql).df()


def test_sql_scalar_select_matches_duckdb(sqlf_ds):
    from elasticsearch_ray.search.sql import sql_query

    stmt = ("SELECT k, UPPER(k) AS ku, LENGTH(k) AS n2, "
            "SUBSTRING(k, 1, 1) AS k1 FROM t ORDER BY k")
    got = sql_query(stmt, sqlf_ds).to_pandas().reset_index(drop=True)
    exp = _duck(stmt)
    assert got["ku"].tolist() == exp["ku"].tolist()
    assert [int(x) for x in got["n2"]] == [int(x) for x in exp["n2"]]
    assert got["k1"].tolist() == exp["k1"].tolist()


def test_sql_scalar_where_matches_duckdb(sqlf_ds):
    from elasticsearch_ray.search.sql import sql_query

    stmt = ("SELECT k, YEAR(ts) AS y FROM t "
            "WHERE YEAR(ts) = 2024 ORDER BY k")
    got = sql_query(stmt, sqlf_ds).to_pandas().reset_index(drop=True)
    exp = _duck(stmt)
    assert got["k"].tolist() == exp["k"].tolist()
    assert [int(x) for x in got["y"]] == [int(x) for x in exp["y"]]


def test_sql_translate_scalar_golden():
    from elasticsearch_ray.search.sql import sql_translate

    pipe = sql_translate(
        "SELECT UCASE(k) AS ku FROM t WHERE LENGTH(k) = 2 LIMIT 3")
    assert pipe == ('FROM t | WHERE LENGTH ( k ) == 2 | '
                    'EVAL ku = UCASE ( k ) | LIMIT 3 | KEEP ku')


def test_cast_and_to_conversions():
    assert list(_ev("CAST(v AS INTEGER)")) == [1, -2, 3, 4]
    assert _ev('CAST(v AS VARCHAR)').tolist()[0] == "1.5"
    assert list(_ev("TO_LONG(v)")) == [1, -2, 3, 4]
    assert _ev("TO_STRING(YEAR(ts))").tolist() == [
        "2024", "2024", "2023", "2024"]
    assert _ev('CAST("7" AS BIGINT) + 1') == 8  # literal fold -> scalar
    with pytest.raises(QlError, match="unknown type"):
        compile_ql("CAST(v AS BLOB)")


def test_stats_median_percentile(ray_session):
    import ray.data as rd

    from elasticsearch_ray.search.esql import esql
    from elasticsearch_ray.search.sql import sql_query

    df = pd.DataFrame({"k": ["a", "a", "b", "b", "b"],
                       "v": [1.0, 3.0, 2.0, 4.0, 10.0]})
    t = {"t": rd.from_pandas(df).repartition(2)}
    out = sql_query(
        "SELECT k, MEDIAN(v) AS med, PERCENTILE(v, 90) AS p90, "
        "COUNT(*) AS c FROM t GROUP BY k ORDER BY k", t).to_pandas()
    assert out["med"].tolist() == [2.0, 4.0]
    # linear interpolation (quantile_cont): p90 of [2,4,10] = 8.8
    assert out["p90"].tolist() == pytest.approx([2.8, 8.8])
    # global (no BY) quantile
    g = esql("FROM t | STATS m = MEDIAN(v), p = PERCENTILE(v, 50)",
             t).to_pandas()
    assert g["m"].iloc[0] == 3.0 and g["p"].iloc[0] == 3.0


def test_sql_group_by_computed_alias(sqlf_ds):
    from elasticsearch_ray.search.sql import SqlError, sql_query

    out = sql_query(
        "SELECT YEAR(ts) AS y, COUNT(*) AS c FROM t GROUP BY y ORDER BY y",
        sqlf_ds).to_pandas()
    assert out["y"].tolist() == [2023, 2024]
    assert out["c"].tolist() == [1, 3]
    with pytest.raises(SqlError, match="grouped on their alias"):
        sql_query("SELECT YEAR(ts) AS y, COUNT(*) AS c FROM t GROUP BY k",
                  sqlf_ds)
