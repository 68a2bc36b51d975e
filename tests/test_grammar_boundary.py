"""SQL grammar boundary contract (VERDICT r1 item 9; result-checked per
VERDICT r3 item 1e).

The reference vendors DuckDB's complete PEG grammar (~31.4k LoC,
third_party/duckdb_peg_parser); this engine's hand parser covers the
corpus surface plus the constructs below. This test makes the scope a
TESTED CONTRACT instead of "whatever the corpus used":

- SUPPORTED constructs must parse AND execute AND return the
  DuckDB-correct rows (each entry carries its expected result — a plain
  execution smoke is exactly how the round-3 QUALIFY hole survived);
- UNSUPPORTED constructs must fail with a clean engine error (an engine
  DuckPGQError subclass, never a crash or silent wrong answer).

Expected-result encodings:
- list of tuples             — multiset comparison (sorted) unless the
                               query has a top-level ORDER BY, then exact
- ("rowcount", n)            — nondeterministic content (e.g. SAMPLE)

Moving a construct between the lists is a deliberate, reviewed act.
"""

import pytest

import duckpgq_tpu
from duckpgq_tpu.errors import DuckPGQError


@pytest.fixture()
def con():
    c = duckpgq_tpu.connect()
    c.execute("CREATE TABLE t(a BIGINT, b VARCHAR, c DOUBLE)")
    c.execute("INSERT INTO t VALUES (1,'x',1.5),(2,'y',2.5),(3,'x',3.5)")
    return c


# Each row: (name, sql, expected, ordered)
# fetchall() is TYPED since round 5 (datetime.date/datetime, Interval —
# which compares equal to its (months, days, micros) tuple — Decimal,
# dict structs/maps); raw engine representations live behind raw=True.
SUPPORTED = [
    ("window-partition-order",
     "SELECT a, sum(a) OVER (PARTITION BY b ORDER BY a) FROM t",
     [(1, 1), (2, 2), (3, 4)], False),
    ("window-rows-frame",
     "SELECT a, sum(a) OVER (ORDER BY a ROWS BETWEEN 1 PRECEDING AND "
     "1 FOLLOWING) FROM t ORDER BY a",
     [(1, 3), (2, 6), (3, 5)], True),
    ("window-range-frame",
     "SELECT a, count(*) OVER (ORDER BY a RANGE BETWEEN 1 PRECEDING AND "
     "CURRENT ROW) FROM t ORDER BY a",
     [(1, 1), (2, 2), (3, 2)], True),
    ("window-groups-frame",
     "SELECT a, count(*) OVER (ORDER BY b GROUPS BETWEEN CURRENT ROW AND "
     "CURRENT ROW) FROM t ORDER BY a",
     [(1, 2), (2, 1), (3, 2)], True),
    ("cte", "WITH q AS (SELECT a FROM t) SELECT * FROM q",
     [(1,), (2,), (3,)], False),
    ("exists-subquery",
     "SELECT a FROM t WHERE EXISTS (SELECT 1 FROM t t2 WHERE t2.a > t.a)",
     [(1,), (2,)], False),
    ("in-subquery",
     "SELECT a FROM t WHERE a IN (SELECT a FROM t WHERE a > 1)",
     [(2,), (3,)], False),
    ("scalar-subquery", "SELECT (SELECT max(a) FROM t)", [(3,)], False),
    ("correlated-subquery",
     "SELECT a, (SELECT count(*) FROM t t2 WHERE t2.a <= t.a) FROM t",
     [(1, 1), (2, 2), (3, 3)], False),
    ("case", "SELECT CASE WHEN a > 1 THEN 'big' ELSE 'small' END FROM t",
     [("small",), ("big",), ("big",)], False),
    ("cast-both-syntaxes", "SELECT CAST(a AS VARCHAR), a::DOUBLE FROM t",
     [("1", 1.0), ("2", 2.0), ("3", 3.0)], False),
    ("values-clause", "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) v(x, y)",
     [(1, "a"), (2, "b")], False),
    ("distinct-on", "SELECT DISTINCT ON (b) a, b FROM t ORDER BY b, a",
     [(1, "x"), (2, "y")], True),
    ("qualify",
     "SELECT a, row_number() OVER (ORDER BY a) rn FROM t QUALIFY rn = 1",
     [(1, 1)], False),
    ("qualify-direct-window",
     "SELECT b, a FROM t QUALIFY row_number() OVER (PARTITION BY b "
     "ORDER BY a DESC) = 1",
     [("x", 3), ("y", 2)], False),
    ("using-sample", "SELECT * FROM t USING SAMPLE 1",
     ("rowcount", 1), False),
    ("struct-literal", "SELECT {'x': 1, 'y': 2}",
     [({"x": 1, "y": 2},)], False),
    ("list-literal", "SELECT [1, 2, 3]", [([1, 2, 3],)], False),
    ("try-cast", "SELECT TRY_CAST('abc' AS BIGINT)", [(None,)], False),
    ("ilike", "SELECT b ILIKE 'X%' FROM t",
     [(True,), (False,), (True,)], False),
    ("similar-to", "SELECT b SIMILAR TO 'x.*' FROM t",
     [(True,), (False,), (True,)], False),
    ("glob", "SELECT b GLOB 'x*' FROM t",
     [(True,), (False,), (True,)], False),
    ("between", "SELECT a BETWEEN 1 AND 2 FROM t",
     [(True,), (True,), (False,)], False),
    ("is-distinct-from", "SELECT a IS DISTINCT FROM 2 FROM t",
     [(True,), (False,), (True,)], False),
    ("collate-nocase", "SELECT 'HELLO' = 'hello' COLLATE NOCASE",
     [(True,)], False),
    ("collate-order",
     "SELECT s FROM (VALUES ('b'),('A'),('c')) v(s) "
     "ORDER BY s COLLATE NOCASE",
     [("A",), ("b",), ("c",)], True),
    ("collate-noaccent", "SELECT 'héllo' = 'hello' COLLATE NOACCENT",
     [(True,)], False),
    ("union-all-by-name",
     "SELECT a FROM t UNION ALL BY NAME SELECT a FROM t",
     [(1,), (2,), (3,), (1,), (2,), (3,)], False),
    ("positional-join", "SELECT * FROM t POSITIONAL JOIN t t2",
     [(1, "x", 1.5, 1, "x", 1.5), (2, "y", 2.5, 2, "y", 2.5),
      (3, "x", 3.5, 3, "x", 3.5)], False),
    # NATURAL JOIN dedups the shared columns in SELECT * (DuckDB/SQL
    # USING-clause semantics, fixed round 5)
    ("natural-join", "SELECT * FROM t NATURAL JOIN t t2",
     [(1, "x", 1.5), (2, "y", 2.5), (3, "x", 3.5)], False),
    ("semi-join", "SELECT * FROM t SEMI JOIN t t2 ON t.a = t2.a",
     [(1, "x", 1.5), (2, "y", 2.5), (3, "x", 3.5)], False),
    ("full-outer-join",
     "SELECT * FROM t FULL OUTER JOIN t t2 ON t.a = t2.a",
     [(1, "x", 1.5, 1, "x", 1.5), (2, "y", 2.5, 2, "y", 2.5),
      (3, "x", 3.5, 3, "x", 3.5)], False),
    ("group-by-all", "SELECT b, count(*) FROM t GROUP BY ALL",
     [("x", 2), ("y", 1)], False),
    ("star-exclude", "SELECT * EXCLUDE (b) FROM t",
     [(1, 1.5), (2, 2.5), (3, 3.5)], False),
    ("recursive-cte",
     "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM r "
     "WHERE n<3) SELECT * FROM r",
     [(1,), (2,), (3,)], False),
    ("recursive-cte-union-dedup",
     "WITH RECURSIVE r(n) AS (SELECT 1 UNION SELECT 1 + (n % 3) FROM r) "
     "SELECT * FROM r",
     [(1,), (2,), (3,)], False),
    ("order-by-all", "SELECT * FROM t ORDER BY ALL",
     [(1, "x", 1.5), (2, "y", 2.5), (3, "x", 3.5)], True),
    ("star-replace", "SELECT * REPLACE (a + 1 AS a) FROM t",
     [(2, "x", 1.5), (3, "y", 2.5), (4, "x", 3.5)], False),
    ("lambda-arrow", "SELECT list_transform([1,2,3], x -> x + 1)",
     [([2, 3, 4],)], False),
    ("lambda-filter", "SELECT list_filter([1,2,3,4], x -> x % 2 = 0)",
     [([2, 4],)], False),
    ("list-comprehension", "SELECT [x * 2 FOR x IN [1, 2, 3] IF x > 1]",
     [([4, 6],)], False),
    ("date-arithmetic", "SELECT DATE '2020-01-01' + 31",
     [(__import__("datetime").date(2020, 2, 1),)], False),
    ("prepare-execute",
     "PREPARE gbtest AS SELECT a FROM t WHERE a = $1; EXECUTE gbtest(2)",
     [(2,)], False),
    ("grouping-sets",
     "SELECT b, count(*) FROM t GROUP BY GROUPING SETS ((b), ())",
     [("x", 2), ("y", 1), (None, 3)], False),
    ("rollup", "SELECT b, count(*) FROM t GROUP BY ROLLUP (b)",
     [("x", 2), ("y", 1), (None, 3)], False),
    ("cube", "SELECT b, count(*) FROM t GROUP BY CUBE (b)",
     [("x", 2), ("y", 1), (None, 3)], False),
    ("lateral-join", "SELECT * FROM t, LATERAL (SELECT t.a + 1) s(x)",
     [(1, "x", 1.5, 2), (2, "y", 2.5, 3), (3, "x", 3.5, 4)], False),
    ("cross-join-lateral",
     "SELECT * FROM t CROSS JOIN LATERAL (SELECT t.a * 2 AS d) s",
     [(1, "x", 1.5, 2), (2, "y", 2.5, 4), (3, "x", 3.5, 6)], False),
    ("columns-regex", "SELECT COLUMNS('[ab]') FROM t",
     [(1, "x"), (2, "y"), (3, "x")], False),
    # INTERVAL fetches as (months, days, micros)
    ("interval-literal", "SELECT INTERVAL 1 DAY", [((0, 1, 0),)], False),
    ("interval-arithmetic",
     "SELECT DATE '2020-01-01' + INTERVAL 2 HOUR",
     [(__import__("datetime").datetime(2020, 1, 1, 2, 0),)], False),
    ("asof-join", "SELECT * FROM t ASOF JOIN t t2 ON t.a >= t2.a",
     [(1, "x", 1.5, 1, "x", 1.5), (2, "y", 2.5, 2, "y", 2.5),
      (3, "x", 3.5, 3, "x", 3.5)], False),
    # PIVOT groups by the remaining column c; columns ordered x, y
    ("pivot", "PIVOT t ON b USING sum(a)",
     [(1.5, 1, None), (2.5, None, 2), (3.5, 3, None)], False),
    ("unpivot",
     "UNPIVOT (SELECT 1 AS p, 2 AS q) ON p, q INTO NAME k VALUE v",
     [("p", 1), ("q", 2)], False),
    ("interval-calendar-units", "SELECT INTERVAL 1 MONTH",
     [((1, 0, 0),)], False),   # Interval == (months, days, micros)
    # calendar month add clamps to end-of-month: 2020-02-29
    ("interval-calendar-arithmetic",
     "SELECT DATE '2020-01-31' + INTERVAL 1 MONTH",
     [(__import__("datetime").datetime(2020, 2, 29),)], False),
    ("at-time-zone",
     "SELECT TIMESTAMP '2020-01-01 00:00:00' AT TIME ZONE 'UTC'",
     [(__import__("datetime").datetime(
         2020, 1, 1, tzinfo=__import__("datetime").timezone.utc),)],
     False),
    # 2021-07-01 12:00 America/New_York = 16:00 UTC
    ("at-time-zone-named",
     "SELECT TIMESTAMP '2021-07-01 12:00:00' AT TIME ZONE "
     "'America/New_York'",
     [(__import__("datetime").datetime(
         2021, 7, 1, 16, 0, tzinfo=__import__("datetime").timezone.utc),)],
     False),
    # chained tail is left-associative (expression.gram:262-263):
    # 12:00 UTC -> TSTZ, then named-zone wall time 08:00 (EDT, UTC-4)
    ("at-time-zone-chained",
     "SELECT TIMESTAMP '2020-06-01 12:00:00' AT TIME ZONE 'UTC' "
     "AT TIME ZONE 'America/New_York'",
     [(__import__("datetime").datetime(2020, 6, 1, 8, 0),)], False),
    ("named-arg-read-csv-roundtrip",
     # exercised via error contract below; header:= on read_csv is the
     # positive path, tested in test_named_args_table_function
     "SELECT 1", [(1,)], False),
    # ---- round-5 closures of the VERDICT r4 contract gaps ----
    ("substring-from-for", "SELECT SUBSTRING('hello world' FROM 7 FOR 3)",
     [("wor",)], False),
    ("substring-from", "SELECT SUBSTRING('hello' FROM 2)",
     [("ello",)], False),
    ("ignore-nulls-lag",
     "SELECT x, lag(y) IGNORE NULLS OVER (ORDER BY x) FROM "
     "(VALUES (1, 10), (2, NULL), (3, 30)) v(x, y) ORDER BY x",
     [(1, None), (2, 10), (3, 10)], True),
    ("window-order-nulls-first",
     "SELECT row_number() OVER (ORDER BY y NULLS FIRST) FROM "
     "(VALUES (1, 10), (2, NULL)) v(x, y) ORDER BY x",
     [(2,), (1,)], False),
    ("create-type-enum",
     "CREATE OR REPLACE TYPE gb_mood AS ENUM ('sad', 'happy'); "
     "SELECT 'happy'::gb_mood, typeof('sad'::gb_mood)",
     [("happy", "gb_mood")], False),
    ("row-constructor", "SELECT row(1, 'x')::VARCHAR",
     [("(1, x)",)], False),
    ("json-arrow",
     "SELECT '{\"a\": {\"b\": 42}}' -> 'a' ->> 'b'",
     [("42",)], False),
    ("json-extract",
     "SELECT json_extract('{\"a\": [1, 2, 3]}', '$.a[1]')",
     [("2",)], False),
    ("to-json", "SELECT to_json([1, 2])", [("[1,2]",)], False),
    ("hugeint-literal",
     "SELECT 170141183460469231731687303715884105727 - 1",
     [(170141183460469231731687303715884105726,)], False),
    ("bitstring-agg",
     "SELECT bitstring_agg(x)::VARCHAR FROM (VALUES (1),(3)) v(x)",
     [("101",)], False),
    # map[k] returns the bare value (host >= 1.2); map_extract keeps the
    # one-element-list form
    ("map-bare-extract", "SELECT map([1, 2], [10, 20])[2]",
     [(20,)], False),
    ("epoch-ms-bigint", "SELECT epoch_ms(86400000)::VARCHAR",
     [("1970-01-02 00:00:00",)], False),
    ("decimal-literal-typeof", "SELECT typeof(0.1), 0.1 + 0.2 = 0.3",
     [("DECIMAL(2,1)", True)], False),
    ("using-join-dedup",
     "SELECT * FROM t a JOIN t b USING (a, b, c) WHERE a.a = 1",
     [(1, "x", 1.5)], False),
]

# Constructs of DuckDB's vendored grammar that are OUT OF SCOPE here; each
# must fail with a clean engine error. Revisit deliberately.
UNSUPPORTED = [
    # named parameters parse, but no scalar builtin declares any — binder
    # error, not a parse crash (select.gram:88-91)
    ("named-arg-scalar", "SELECT abs(x := 1)"),
    ("named-arg-fat-arrow", "SELECT abs(x => 1)"),
    # unknown collation names are a catalog error
    ("unknown-collation", "SELECT 'a' = 'b' COLLATE NOSUCH"),
]


@pytest.mark.parametrize("name,sql,expected,ordered", SUPPORTED,
                         ids=[n for n, *_ in SUPPORTED])
def test_supported_construct(con, name, sql, expected, ordered):
    rows = con.execute(sql).fetchall()
    if isinstance(expected, tuple) and expected and \
            expected[0] == "rowcount":
        assert len(rows) == expected[1], \
            f"{name}: expected {expected[1]} rows, got {len(rows)}"
        return
    if ordered:
        assert rows == expected, f"{name}: ordered result mismatch"
    else:
        key = lambda r: tuple((v is None, str(v)) for v in r)  # noqa: E731
        assert sorted(rows, key=key) == sorted(expected, key=key), \
            f"{name}: multiset result mismatch: {rows!r} != {expected!r}"


@pytest.mark.parametrize("name,sql", UNSUPPORTED,
                         ids=[n for n, _ in UNSUPPORTED])
def test_unsupported_construct_fails_cleanly(con, name, sql):
    with pytest.raises(DuckPGQError):
        con.execute(sql).fetchall()


def test_named_args_table_function(con, tmp_path):
    p = tmp_path / "named.csv"
    p.write_text("a;b\n1;x\n2;y\n")
    rows = con.execute(
        f"SELECT * FROM read_csv('{p}', delim := ';', header := true)"
    ).fetchall()
    assert rows == [(1, "x"), (2, "y")]
    with pytest.raises(DuckPGQError):
        con.execute(
            f"SELECT * FROM read_csv('{p}', nosuch := 1)").fetchall()
