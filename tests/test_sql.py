"""x-pack SQL subset (SqlParser / _sql/translate analogs): translation
goldens + execution equality vs DuckDB on the same frame."""

import duckdb
import pandas as pd
import pytest

from elasticsearch_ray.search.sql import SqlError, sql_query, sql_translate

DF = pd.DataFrame({
    "user": ["u1", "u2", "u1", "u3", "u2", "u1", None],
    "kind": ["a", "b", "a", "a", "b", "c", "a"],
    "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
    "n": [10, 20, 30, 40, 50, 60, 70],
})


@pytest.fixture(scope="module")
def sql_ds(ray_session):
    import ray.data as rd

    return {"t": rd.from_pandas(DF).repartition(3)}


def _duck(sql):
    con = duckdb.connect()
    con.register("t", DF)
    return con.execute(sql).df()


def _run(sql, tables):
    out = sql_query(sql, tables).to_pandas()
    return out.reset_index(drop=True)


def test_translate_goldens():
    assert sql_translate("SELECT a, b FROM t WHERE x = 1 LIMIT 5") == \
        "FROM t | WHERE x == 1 | LIMIT 5 | KEEP a, b"
    assert sql_translate(
        "SELECT kind, SUM(v) AS total FROM t GROUP BY kind "
        "HAVING total > 3 ORDER BY total DESC LIMIT 2") == \
        ("FROM t | STATS total = SUM(v) BY kind | WHERE total > 3 "
         "| SORT total DESC | LIMIT 2 | KEEP kind, total")
    assert sql_translate("SELECT DISTINCT kind FROM t") == \
        "FROM t | STATS __cnt = COUNT(*) BY kind | KEEP kind"
    assert sql_translate(
        "SELECT user FROM t WHERE kind LIKE 'a%' AND v <> 3") == \
        'FROM t | WHERE kind LIKE "a*" AND v != 3 | KEEP user'
    assert sql_translate("SELECT * FROM t WHERE u IS NOT NULL") == \
        "FROM t | WHERE u IS NOT NULL"


def test_where_order_limit(sql_ds):
    sql = "SELECT user, v FROM t WHERE v >= 3 ORDER BY v DESC LIMIT 3"
    got = _run(sql, sql_ds)
    want = _duck(sql)
    pd.testing.assert_frame_equal(got, want)


def test_group_by_aggregates(sql_ds):
    sql = ("SELECT kind, SUM(v) AS total, COUNT(*) AS c "
           "FROM t GROUP BY kind ORDER BY kind")
    got = _run(sql, sql_ds)
    want = _duck(sql)
    got["c"] = got["c"].astype("int64")
    want["c"] = want["c"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_having(sql_ds):
    sql = ("SELECT kind, AVG(v) AS m FROM t GROUP BY kind "
           "HAVING m > 2 ORDER BY m")
    got = _run(sql, sql_ds)
    want = _duck(sql)
    pd.testing.assert_frame_equal(got, want)


def test_count_distinct_and_null_filter(sql_ds):
    sql = ("SELECT COUNT_DISTINCT(user) AS u FROM t "
           "WHERE user IS NOT NULL")
    got = _run(sql, sql_ds)
    assert got["u"].iloc[0] == 3


def test_distinct(sql_ds):
    sql = "SELECT DISTINCT kind FROM t ORDER BY kind"
    got = _run(sql, sql_ds)
    want = _duck(sql)
    pd.testing.assert_frame_equal(got, want)


def test_select_alias_rename(sql_ds):
    sql = "SELECT user AS who, v FROM t WHERE v = 6"
    got = _run(sql, sql_ds)
    assert list(got.columns) == ["who", "v"]
    assert got["who"].tolist() == ["u1"]


def test_in_and_like(sql_ds):
    sql = ("SELECT v FROM t WHERE kind IN ('a', 'c') AND user LIKE 'u_' "
           "ORDER BY v")
    got = _run(sql, sql_ds)
    want = _duck("SELECT v FROM t WHERE kind IN ('a', 'c') "
                 "AND user LIKE 'u_' ORDER BY v")
    pd.testing.assert_frame_equal(got, want)


def test_errors():
    with pytest.raises(SqlError):
        sql_translate("SELECT a FROM t GROUP BY b")  # a not grouped
    with pytest.raises(SqlError):
        sql_translate("FROM t")  # no SELECT
    with pytest.raises(SqlError):
        sql_translate("SELECT a FROM t HAVING a > 1")  # HAVING w/o group
    with pytest.raises(SqlError):
        sql_translate("SELECT SUM(*) FROM t")
    with pytest.raises(SqlError):
        sql_translate("SELECT a FROM t ORDER BY")  # empty order


def test_order_by_original_name_with_alias(sql_ds):
    # SQL allows ORDER BY / HAVING on the pre-alias column name
    sql = ("SELECT kind AS k, COUNT(*) AS c FROM t GROUP BY kind "
           "ORDER BY kind")
    got = _run(sql, sql_ds)
    assert list(got.columns) == ["k", "c"]
    assert got["k"].tolist() == sorted(got["k"].tolist())
    sql = ("SELECT kind AS k, SUM(v) AS s FROM t GROUP BY kind "
           "HAVING s > 3 ORDER BY s DESC")
    got = _run(sql, sql_ds)
    assert (got["s"] > 3).all()


def test_star_with_group_by_rejected():
    with pytest.raises(SqlError):
        sql_translate("SELECT * FROM t GROUP BY kind")


def test_expression_select_items(sql_ds):
    sql = ("SELECT user, v * 2 + n AS score FROM t "
           "WHERE v >= 3 ORDER BY score DESC LIMIT 3")
    got = _run(sql, sql_ds)
    want = _duck(sql)
    got["score"] = got["score"].astype(float)
    want["score"] = want["score"].astype(float)
    pd.testing.assert_frame_equal(got, want)
    with pytest.raises(SqlError, match="AS"):
        sql_translate("SELECT v * 2 FROM t")
    with pytest.raises(SqlError, match="combined"):
        sql_translate("SELECT v * 2 AS x, SUM(n) AS s FROM t")


def test_show_tables_and_describe(sql_ds):
    out = sql_query("SHOW TABLES", sql_ds)
    assert out["name"].tolist() == ["t"]
    assert out["type"].tolist() == ["TABLE"]
    out2 = sql_query("SHOW TABLES LIKE 'z%'", sql_ds)
    assert len(out2) == 0
    d = sql_query("DESCRIBE t", sql_ds)
    got = dict(zip(d["column"], d["type"]))
    assert got["user"] == "VARCHAR" and got["n"] == "BIGINT"
    assert got["v"] == "DOUBLE"
    with pytest.raises(SqlError, match="Unknown index"):
        sql_query("DESCRIBE nope", sql_ds)


def test_show_describe_with_callable_resolver(sql_ds):
    """Review r5 #9: the callable-resolver tables form must not crash
    with TypeError."""
    resolver = lambda name: sql_ds[name]  # noqa: E731
    with pytest.raises(SqlError, match="table MAP"):
        sql_query("SHOW TABLES", resolver)
    d = sql_query("DESCRIBE t", resolver)
    assert "column" in d.columns and len(d) == 4
    with pytest.raises(SqlError, match="Unknown index"):
        sql_query("DESCRIBE nope", resolver)


# ---------------------------------------------------------------- PIVOT

def test_pivot_basic_vs_duckdb(sql_ds):
    # Pivot.java semantics: grouping = child output minus pivot col
    # minus agg arg; IN-list order; absent combos null
    out = sql_query(
        "SELECT * FROM (SELECT user, kind, v FROM t "
        "WHERE user IS NOT NULL) "
        "PIVOT (SUM(v) FOR kind IN ('a' AS a, 'b' AS b)) ORDER BY user",
        sql_ds)
    exp = _duck("""
        SELECT "user", sum(CASE WHEN kind='a' THEN v END) AS a,
               sum(CASE WHEN kind='b' THEN v END) AS b
        FROM t WHERE kind IN ('a','b') AND "user" IS NOT NULL
        GROUP BY "user" ORDER BY "user"
    """)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp, check_dtype=False)


def test_pivot_rows_outside_in_list_dropped(sql_ds):
    # u1 has a 'c' row (v=6): it must not leak into any pivot column,
    # and a group whose rows are ALL outside the list is absent
    out = sql_query(
        "SELECT * FROM (SELECT user, kind, v FROM t) "
        "PIVOT (SUM(v) FOR kind IN ('c'))", sql_ds)
    assert list(out.columns) == ["user", "c"]
    assert out["user"].tolist() == ["u1"]
    assert out["c"].tolist() == [6.0]


def test_pivot_numeric_values_inner_where_order_limit(sql_ds):
    out = sql_query(
        "SELECT * FROM (SELECT kind, n, v FROM t WHERE v >= 2) "
        "PIVOT (COUNT(v) FOR n IN (20, 30, 40)) ORDER BY kind LIMIT 2",
        sql_ds)
    assert list(out.columns) == ["kind", "20", "30", "40"]
    assert out["kind"].tolist() == ["a", "b"]
    # kind 'a': rows n=30 (v=3), n=40 (v=4); kind 'b': n=20 (v=2)
    assert out.loc[0, "30"] == 1 and out.loc[0, "40"] == 1
    assert out.loc[1, "20"] == 1 and pd.isna(out.loc[1, "30"])


def test_pivot_bare_table_source(sql_ds):
    # PIVOT directly on a table groups on every remaining column
    out = sql_query(
        "SELECT * FROM t PIVOT (MIN(v) FOR kind IN ('a', 'b')) "
        "ORDER BY user, n", sql_ds)
    assert list(out.columns) == ["user", "n", "a", "b"]


def test_pivot_errors(sql_ds):
    with pytest.raises(SqlError, match="aggregate"):
        sql_query("SELECT * FROM t PIVOT (FOO(v) FOR kind IN ('a'))",
                  sql_ds)
    with pytest.raises(SqlError, match="literal"):
        sql_query("SELECT * FROM t PIVOT (SUM(v) FOR kind IN (user))",
                  sql_ds)
    with pytest.raises(SqlError, match="not in the child output"):
        sql_query("SELECT * FROM (SELECT user, v FROM t) "
                  "PIVOT (SUM(v) FOR kind IN ('a'))", sql_ds)
    with pytest.raises(SqlError, match="grouping column"):
        sql_query("SELECT * FROM (SELECT kind, v FROM t) "
                  "PIVOT (SUM(v) FOR kind IN ('a'))", sql_ds)


# -------------------------------------------------- command layer (SYS)

def test_show_functions():
    out = sql_query("SHOW FUNCTIONS", {})
    assert list(out.columns) == ["name", "type"]
    types = dict(zip(out["name"], out["type"]))
    assert types["SUM"] == "AGGREGATE"
    assert types["HISTOGRAM"] == "GROUPING"
    assert types["COALESCE"] == "CONDITIONAL"
    assert types["SUBSTRING"] == "SCALAR"
    assert (out["name"] == sorted(out["name"])).all()
    like = sql_query("SHOW FUNCTIONS LIKE 'DATE%'", {})
    assert set(like["name"]) == {n for n in types if n.startswith("DATE")}


def test_show_catalogs_schemas():
    cat = sql_query("SHOW CATALOGS", {})
    assert cat["name"].tolist() == ["elasticsearch-ray"]
    assert cat["type"].tolist() == ["local"]
    sch = sql_query("SHOW SCHEMAS", {})
    assert list(sch.columns) == ["schema"] and len(sch) == 0


def test_sys_tables_columns_types(sql_ds):
    tabs = sql_query("SYS TABLES", sql_ds)
    assert tabs["TABLE_NAME"].tolist() == ["t"]
    assert tabs["TABLE_TYPE"].tolist() == ["TABLE"]
    assert sql_query("SYS TABLES LIKE 'z%'", sql_ds).empty

    cols = sql_query("SYS COLUMNS TABLE LIKE 't'", sql_ds)
    assert cols["COLUMN_NAME"].tolist() == ["user", "kind", "v", "n"]
    assert cols["ORDINAL_POSITION"].tolist() == [1, 2, 3, 4]
    byname = dict(zip(cols["COLUMN_NAME"], cols["TYPE_NAME"]))
    assert byname["v"] == "DOUBLE" and byname["n"] == "BIGINT"
    assert byname["user"] == "VARCHAR"
    jdbc = dict(zip(cols["COLUMN_NAME"], cols["DATA_TYPE"]))
    assert jdbc["v"] == 8 and jdbc["n"] == -5 and jdbc["user"] == 12
    only_v = sql_query("SYS COLUMNS TABLE LIKE 't' LIKE 'v'", sql_ds)
    assert only_v["COLUMN_NAME"].tolist() == ["v"]

    typ = sql_query("SYS TYPES", sql_ds)
    assert (typ["DATA_TYPE"] == sorted(typ["DATA_TYPE"])).all()
    assert "TIMESTAMP" in set(typ["TYPE_NAME"])
