"""SQL grammar boundary contract (VERDICT r1 item 9).

The reference vendors DuckDB's complete PEG grammar (~31.4k LoC,
third_party/duckdb_peg_parser); this engine's hand parser covers the
corpus surface plus the constructs below. This test makes the scope a
TESTED CONTRACT instead of "whatever the corpus used":

- SUPPORTED constructs must parse AND execute;
- UNSUPPORTED constructs must fail with a clean engine error (an engine
  DuckPGQError subclass, never a crash or silent wrong answer).

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


SUPPORTED = [
    ("window-partition-order",
     "SELECT a, sum(a) OVER (PARTITION BY b ORDER BY a) FROM t"),
    ("cte", "WITH q AS (SELECT a FROM t) SELECT * FROM q"),
    ("exists-subquery",
     "SELECT a FROM t WHERE EXISTS (SELECT 1 FROM t t2 WHERE t2.a > t.a)"),
    ("in-subquery",
     "SELECT a FROM t WHERE a IN (SELECT a FROM t WHERE a > 1)"),
    ("scalar-subquery", "SELECT (SELECT max(a) FROM t)"),
    ("correlated-subquery",
     "SELECT a, (SELECT count(*) FROM t t2 WHERE t2.a <= t.a) FROM t"),
    ("case", "SELECT CASE WHEN a > 1 THEN 'big' ELSE 'small' END FROM t"),
    ("cast-both-syntaxes", "SELECT CAST(a AS VARCHAR), a::DOUBLE FROM t"),
    ("values-clause", "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) v(x, y)"),
    ("distinct-on", "SELECT DISTINCT ON (b) a, b FROM t ORDER BY b, a"),
    ("qualify",
     "SELECT a, row_number() OVER (ORDER BY a) rn FROM t QUALIFY rn = 1"),
    ("using-sample", "SELECT * FROM t USING SAMPLE 1"),
    ("struct-literal", "SELECT {'x': 1, 'y': 2}"),
    ("list-literal", "SELECT [1, 2, 3]"),
    ("try-cast", "SELECT TRY_CAST('abc' AS BIGINT)"),
    ("ilike", "SELECT b ILIKE 'X%' FROM t"),
    ("similar-to", "SELECT b SIMILAR TO 'x.*' FROM t"),
    ("glob", "SELECT b GLOB 'x*' FROM t"),
    ("between", "SELECT a BETWEEN 1 AND 2 FROM t"),
    ("is-distinct-from", "SELECT a IS DISTINCT FROM 2 FROM t"),
    ("union-all-by-name", "SELECT a FROM t UNION ALL BY NAME SELECT a FROM t"),
    ("positional-join", "SELECT * FROM t POSITIONAL JOIN t t2"),
    ("natural-join", "SELECT * FROM t NATURAL JOIN t t2"),
    ("semi-join", "SELECT * FROM t SEMI JOIN t t2 ON t.a = t2.a"),
    ("full-outer-join", "SELECT * FROM t FULL OUTER JOIN t t2 ON t.a = t2.a"),
    ("group-by-all", "SELECT b, count(*) FROM t GROUP BY ALL"),
    ("star-exclude", "SELECT * EXCLUDE (b) FROM t"),
    ("recursive-cte",
     "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM r "
     "WHERE n<3) SELECT * FROM r"),
    ("recursive-cte-union-dedup",
     "WITH RECURSIVE r(n) AS (SELECT 1 UNION SELECT 1 + (n % 3) FROM r) "
     "SELECT * FROM r"),
    ("order-by-all", "SELECT * FROM t ORDER BY ALL"),
    ("star-replace", "SELECT * REPLACE (a + 1 AS a) FROM t"),
    ("lambda-arrow", "SELECT list_transform([1,2,3], x -> x + 1)"),
    ("lambda-filter", "SELECT list_filter([1,2,3,4], x -> x % 2 = 0)"),
    ("list-comprehension", "SELECT [x * 2 FOR x IN [1, 2, 3] IF x > 1]"),
    ("date-arithmetic", "SELECT DATE '2020-01-01' + 31"),
    ("prepare-execute",
     "PREPARE gbtest AS SELECT a FROM t WHERE a = $1; EXECUTE gbtest(2)"),
    ("grouping-sets",
     "SELECT b, count(*) FROM t GROUP BY GROUPING SETS ((b), ())"),
    ("rollup", "SELECT b, count(*) FROM t GROUP BY ROLLUP (b)"),
    ("cube", "SELECT b, count(*) FROM t GROUP BY CUBE (b)"),
    ("lateral-join", "SELECT * FROM t, LATERAL (SELECT t.a + 1) s(x)"),
    ("cross-join-lateral",
     "SELECT * FROM t CROSS JOIN LATERAL (SELECT t.a * 2 AS d) s"),
    ("columns-regex", "SELECT COLUMNS('[ab]') FROM t"),
    ("interval-literal", "SELECT INTERVAL 1 DAY"),
    ("interval-arithmetic",
     "SELECT DATE '2020-01-01' + INTERVAL 2 HOUR"),
    ("asof-join", "SELECT * FROM t ASOF JOIN t t2 ON t.a >= t2.a"),
    ("pivot", "PIVOT t ON b USING sum(a)"),
    ("unpivot",
     "UNPIVOT (SELECT 1 AS p, 2 AS q) ON p, q INTO NAME k VALUE v"),
    ("interval-calendar-units", "SELECT INTERVAL 1 MONTH"),
    ("interval-calendar-arithmetic",
     "SELECT DATE '2020-01-31' + INTERVAL 1 MONTH"),
    ("at-time-zone",
     "SELECT TIMESTAMP '2020-01-01 00:00:00' AT TIME ZONE 'UTC'"),
    ("at-time-zone-named",
     "SELECT TIMESTAMP '2021-07-01 12:00:00' AT TIME ZONE "
     "'America/New_York'"),
]

# Constructs of DuckDB's vendored grammar that are OUT OF SCOPE here; each
# must fail with a clean engine error. Revisit deliberately.
# (round 3: the last two named gaps — calendar INTERVAL units and
# AT TIME ZONE — moved to SUPPORTED; no known grammar gaps remain.)
UNSUPPORTED = []


@pytest.mark.parametrize("name,sql", SUPPORTED, ids=[n for n, _ in SUPPORTED])
def test_supported_construct(con, name, sql):
    con.execute(sql).fetchall()


@pytest.mark.parametrize("name,sql", UNSUPPORTED,
                         ids=[n for n, _ in UNSUPPORTED])
def test_unsupported_construct_fails_cleanly(con, name, sql):
    with pytest.raises(DuckPGQError):
        con.execute(sql).fetchall()
