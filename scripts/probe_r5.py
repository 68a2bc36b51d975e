"""Round-5 self-probe battery: DuckDB-host semantics in classes no prior
judge probe or differential family has exercised. Each case is (sql,
expected-rows) with expectations written from the DuckDB contract the
reference inherits (host engine ~= DuckDB 1.1). Prints PASS/DIVERGE/ERROR
per case and a summary; exit 1 when any case diverges.

Run: python scripts/probe_r5.py  (CPU; no TPU needed)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckpgq_tpu as d

con = d.connect()

CASES = []


def case(sql, expect, note=""):
    CASES.append((sql, expect, note))


# --- star modifiers ---------------------------------------------------
case("SELECT * EXCLUDE (y) FROM (SELECT 1 x, 2 y, 3 z)", [(1, 3)])
case("SELECT * REPLACE (x+10 AS x) FROM (SELECT 1 x, 2 y)", [(11, 2)])
case("SELECT COLUMNS('a.*') FROM (SELECT 1 aa, 2 ab, 3 bc)", [(1, 2)])
# --- DISTINCT ON ------------------------------------------------------
case("SELECT DISTINCT ON (g) g, v FROM (VALUES (1, 'a'), (1, 'b'), "
     "(2, 'c')) t(g, v) ORDER BY g, v", [(1, 'a'), (2, 'c')])
# --- GROUP BY ALL / ORDER BY ALL -------------------------------------
case("SELECT g, sum(v) FROM (VALUES (1, 10), (2, 20), (1, 5)) t(g, v) "
     "GROUP BY ALL ORDER BY ALL", [(1, 15), (2, 20)])
# --- UNION BY NAME ----------------------------------------------------
case("SELECT * FROM (SELECT 1 a, 2 b) UNION ALL BY NAME "
     "(SELECT 4 b, 3 a) ORDER BY a", [(1, 2), (3, 4)])
# --- lambdas / list comprehension ------------------------------------
case("SELECT list_transform([1,2,3], x -> x * 2)", [([2, 4, 6],)])
case("SELECT list_filter([1,2,3,4], x -> x % 2 = 0)", [([2, 4],)])
case("SELECT list_reduce([1,2,3,4], (a, b) -> a + b)", [(10,)])
case("SELECT [x * x FOR x IN [1,2,3]]", [([1, 4, 9],)])
case("SELECT [x FOR x IN [1,2,3,4] IF x > 2]", [([3, 4],)])
# --- list slicing -----------------------------------------------------
case("SELECT ([1,2,3,4,5])[2:4]", [([2, 3, 4],)])
case("SELECT ([1,2,3,4,5])[-2]", [(4,)])
case("SELECT ([1,2,3,4,5])[:2]", [([1, 2],)])
case("SELECT ([1,2,3,4,5])[4:]", [([4, 5],)])
case("SELECT 'hello'[2:4]", [('ell',)])
case("SELECT 'hello'[-3]", [('l',)])
# --- TRY_CAST / TRY ---------------------------------------------------
case("SELECT TRY_CAST('abc' AS INT)", [(None,)])
case("SELECT TRY_CAST('42' AS INT)", [(42,)])
# --- IS DISTINCT FROM -------------------------------------------------
case("SELECT 1 IS DISTINCT FROM NULL, NULL IS NOT DISTINCT FROM NULL",
     [(True, True)])
# --- aggregate modifiers ---------------------------------------------
case("SELECT string_agg(v, ',' ORDER BY v DESC) FROM (VALUES ('a'), "
     "('b'), ('c')) t(v)", [('c,b,a',)])
case("SELECT sum(v) FILTER (WHERE v > 1) FROM (VALUES (1), (2), (3)) "
     "t(v)", [(5,)])
case("SELECT count(DISTINCT g) FROM (VALUES (1), (1), (2)) t(g)", [(2,)])
case("SELECT list(v ORDER BY v DESC) FROM (VALUES (1), (3), (2)) t(v)",
     [([3, 2, 1],)])
# --- ordered-set aggregates ------------------------------------------
case("SELECT median(v) FROM (VALUES (1), (2), (3), (100)) t(v)", [(2.5,)])
case("SELECT quantile_cont(v, 0.5) FROM (VALUES (1.0), (2.0), (3.0), "
     "(4.0)) t(v)", [(2.5,)])
case("SELECT quantile_disc(v, 0.5) FROM (VALUES (1), (2), (3), (4)) "
     "t(v)", [(2,)])
case("SELECT mode(v) FROM (VALUES (1), (2), (2), (3)) t(v)", [(2,)])
# --- window depth -----------------------------------------------------
case("SELECT v, lag(v, 1, -1) OVER (ORDER BY v) FROM (VALUES (1), (2), "
     "(3)) t(v) ORDER BY v", [(1, -1), (2, 1), (3, 2)])
case("SELECT v, ntile(2) OVER (ORDER BY v) FROM (VALUES (1), (2), (3), "
     "(4)) t(v) ORDER BY v", [(1, 1), (2, 1), (3, 2), (4, 2)])
case("SELECT v, percent_rank() OVER (ORDER BY v) FROM (VALUES (1), (2), "
     "(3)) t(v) ORDER BY v", [(1, 0.0), (2, 0.5), (3, 1.0)])
case("SELECT v, cume_dist() OVER (ORDER BY v) FROM (VALUES (1), (2), "
     "(4)) t(v) ORDER BY v",
     [(1, 1 / 3), (2, 2 / 3), (4, 1.0)])
case("SELECT v, sum(v) OVER (ORDER BY v ROWS BETWEEN 1 PRECEDING AND "
     "CURRENT ROW EXCLUDE CURRENT ROW) FROM (VALUES (1), (2), (3)) t(v) "
     "ORDER BY v", [(1, None), (2, 1), (3, 2)])
# --- recursive CTE with UNION (dedup) --------------------------------
case("WITH RECURSIVE t(n) AS (SELECT 1 UNION SELECT (n % 3) + 1 FROM t) "
     "SELECT count(*), sum(n) FROM t", [(3, 6)])
# --- VALUES as table, positional join --------------------------------
case("SELECT * FROM (VALUES (1, 'a'), (2, 'b')) v(i, s) POSITIONAL JOIN "
     "(VALUES ('x'), ('y')) w(t)", [(1, 'a', 'x'), (2, 'b', 'y')])
# --- ASOF join --------------------------------------------------------
case("SELECT a.t, b.v FROM (VALUES (1), (5), (10)) a(t) ASOF JOIN "
     "(VALUES (0, 'x'), (4, 'y'), (9, 'z')) b(t, v) ON a.t >= b.t "
     "ORDER BY a.t", [(1, 'x'), (5, 'y'), (10, 'z')])
# --- generate_series / range -----------------------------------------
case("SELECT generate_series(1, 5, 2)", [([1, 3, 5],)])
case("SELECT range(1, 4)", [([1, 2, 3],)])
case("SELECT count(*) FROM generate_series(1, 10)", [(10,)])
case("SELECT count(*) FROM range(DATE '2024-01-01', DATE '2024-01-05', "
     "INTERVAL 1 DAY)", [(4,)])
# --- struct/map functions --------------------------------------------
case("SELECT struct_pack(a := 1, b := 'x')", [({'a': 1, 'b': 'x'},)])
case("SELECT {'a': 1, 'b': 2}.a", [(1,)])
case("SELECT map_keys(map([1, 2], ['a', 'b']))", [([1, 2],)])
case("SELECT map_values(map([1, 2], ['a', 'b']))", [(['a', 'b'],)])
case("SELECT cardinality(map([1, 2], ['a', 'b']))", [(2,)])
# --- list functions ---------------------------------------------------
case("SELECT flatten([[1, 2], [3]])", [([1, 2, 3],)])
case("SELECT list_sort([3, 1, NULL, 2])", [([None, 1, 2, 3],)])
case("SELECT list_reverse_sort([1, 3, 2])", [([3, 2, 1],)])
case("SELECT list_distinct([1, 2, 2, NULL, 3])", None,
     "order-insensitive: check set equality separately")
case("SELECT list_contains([1, 2, 3], 2)", [(True,)])
case("SELECT list_position([4, 5, 6], 5)", [(2,)])
case("SELECT array_length([1, 2, 3])", [(3,)])
case("SELECT len([1, 2, 3])", [(3,)])
case("SELECT list_append([1, 2], 3), list_prepend(0, [1, 2])",
     [([1, 2, 3], [0, 1, 2])])
case("SELECT [1, 2] || [3]", [([1, 2, 3],)])
case("SELECT list_zip([1, 2], ['a', 'b'])",
     [([{'list_1': 1, 'list_2': 'a'}, {'list_1': 2, 'list_2': 'b'}],)])
case("SELECT unnest([1, 2, 3]) AS u ORDER BY u", [(1,), (2,), (3,)])
# --- string functions -------------------------------------------------
case("SELECT regexp_extract('abc123', '([a-z]+)(\\d+)', 2)", [('123',)])
case("SELECT regexp_extract_all('a1b2', '\\d')", [(['1', '2'],)])
case("SELECT regexp_replace('aaa', 'a', 'b', 'g')", [('bbb',)])
case("SELECT regexp_replace('aaa', 'a', 'b')", [('baa',)])
case("SELECT regexp_matches('hello', 'ELL', 'i')", [(True,)])
case("SELECT format('{} + {} = {}', 1, 2, 3)", [('1 + 2 = 3',)])
case("SELECT printf('%d-%s', 7, 'x')", [('7-x',)])
case("SELECT str_split('a,b,c', ',')", [(['a', 'b', 'c'],)])
case("SELECT string_split_regex('a1b22c', '\\d+')", [(['a', 'b', 'c'],)])
case("SELECT translate('12345', '143', 'ax')", [('a2x5',)])
case("SELECT strip_accents('café')", [('cafe',)])
case("SELECT bar(40, 0, 100, 10)", None, "just must not crash")
case("SELECT to_base(255, 16)", [('FF',)])
case("SELECT hex(255)", [('FF',)])
case("SELECT bin(5)", [('101',)])
case("SELECT ord('A'), chr(66)", [(65, 'B')])
case("SELECT ascii('A')", [(65,)])
case("SELECT levenshtein('kitten', 'sitting')", [(3,)])
case("SELECT jaccard('duck', 'luck')", None, "must not crash")
case("SELECT hamming('abc', 'abd')", [(1,)])
case("SELECT damerau_levenshtein('ab', 'ba')", [(1,)])
# --- date/time depth --------------------------------------------------
case("SELECT date_trunc('quarter', DATE '2024-05-15')",
     "2024-04-01", "date render")
case("SELECT date_diff('day', DATE '2024-01-01', DATE '2024-02-01')",
     [(31,)])
case("SELECT date_sub('month', DATE '2024-01-15', DATE '2024-03-14')",
     [(1,)])
case("SELECT datepart('isodow', DATE '2024-01-07')", [(7,)])
case("SELECT dayname(DATE '2024-01-01'), monthname(DATE '2024-01-01')",
     [('Monday', 'January')])
case("SELECT last_day(DATE '2024-02-10')", "2024-02-29", "leap year")
case("SELECT strftime(DATE '2024-03-05', '%Y/%m/%d')", [('2024/03/05',)])
case("SELECT strptime('2024-03-05 10:30', '%Y-%m-%d %H:%M')",
     "2024-03-05 10:30:00", "timestamp render")
case("SELECT time_bucket(INTERVAL 15 MINUTE, "
     "TIMESTAMP '2024-01-01 10:37:00')", "2024-01-01 10:30:00")
case("SELECT age(TIMESTAMP '2024-03-15', TIMESTAMP '2023-01-10')",
     "1 year 2 months 5 days")
case("SELECT DATE '2024-01-31' + INTERVAL 1 MONTH",
     "2024-02-29 00:00:00", "date+interval promotes to TIMESTAMP here")
case("SELECT TIME '11:30:00' + INTERVAL 45 MINUTE", "12:15:00")
case("SELECT extract(epoch FROM TIMESTAMP '1970-01-02 00:00:00')",
     [(86400.0,)])
case("SELECT make_date(2024, 2, 29)", "2024-02-29")
case("SELECT CAST(make_timestamp(2024, 1, 2, 3, 4, 5.5) AS VARCHAR)",
     "2024-01-02 03:04:05.5")
# --- sequences --------------------------------------------------------
case("CREATE SEQUENCE seq1; SELECT nextval('seq1'), nextval('seq1'), "
     "currval('seq1')", [(1, 2, 2)], "multi-statement")
# --- macros -----------------------------------------------------------
case("CREATE MACRO add1(a, b) AS a + b; SELECT add1(2, 3)", [(5,)])
case("CREATE MACRO tbl_m() AS TABLE SELECT 42 v; "
     "SELECT * FROM tbl_m()", [(42,)])
# --- prepared statements ---------------------------------------------
case("PREPARE p1 AS SELECT $1 + $2; EXECUTE p1(3, 4)", [(7,)])
# --- sampling (deterministic checks only) ----------------------------
case("SELECT count(*) FROM (SELECT * FROM generate_series(1, 100) "
     "USING SAMPLE 10 ROWS) t", [(10,)])
# --- LIMIT forms ------------------------------------------------------
case("SELECT count(*) FROM (SELECT * FROM generate_series(1, 100) "
     "LIMIT 10%) t", [(10,)])
case("SELECT v FROM (VALUES (1), (2), (3)) t(v) ORDER BY v OFFSET 1",
     [(2,), (3,)])
# --- set ops ----------------------------------------------------------
case("SELECT 1 INTERSECT SELECT 1", [(1,)])
case("SELECT v FROM (VALUES (1), (2)) t(v) EXCEPT SELECT 2 ORDER BY v",
     [(1,)])
case("SELECT v FROM (VALUES (1), (1)) t(v) INTERSECT ALL "
     "SELECT v FROM (VALUES (1), (1), (1)) s(v)", [(1,), (1,)])
# --- grouping sets / cube / rollup -----------------------------------
case("SELECT g, grouping(g), count(*) FROM (VALUES (1), (2)) t(g) "
     "GROUP BY ROLLUP (g) ORDER BY grouping(g), g",
     [(1, 0, 1), (2, 0, 1), (None, 1, 2)])
# --- IN subquery / correlated ----------------------------------------
case("SELECT v FROM (VALUES (1), (2), (3)) t(v) WHERE v IN "
     "(SELECT 2)", [(2,)])
case("SELECT (SELECT max(x) FROM (VALUES (1), (2)) s(x) WHERE x < v) "
     "FROM (VALUES (2), (3)) t(v) ORDER BY v", [(1,), (2,)])
case("SELECT v, EXISTS (SELECT 1 WHERE v > 1) FROM (VALUES (1), (2)) "
     "t(v) ORDER BY v", [(1, False), (2, True)])
case("SELECT 2 = ANY (SELECT unnest([1, 2])), "
     "3 > ALL (SELECT unnest([1, 2]))", [(True, True)])
# --- arithmetic / numeric edge ---------------------------------------
case("SELECT 7 // 2, -7 // 2, 7 % 3, -7 % 3", [(3, -3, 1, -1)],
     "DuckDB // truncates toward zero for ints (C++ /), floors for "
     "floats")
case("SELECT 1 / 2", [(0.5,)], "/ on ints is float in DuckDB")
case("SELECT 2 ** 10, power(2, 0.5)", None, "render check")
case("SELECT gcd(12, 18), lcm(4, 6)", [(6, 12)])
case("SELECT factorial(5), 5!", [(120, 120)])
case("SELECT isfinite(1.0), isinf('inf'::DOUBLE), isnan('nan'::DOUBLE)",
     [(True, True, True)])
case("SELECT round(2.5), round(3.5), round(-2.5)", [(3.0, 4.0, -3.0)],
     "DuckDB rounds half away from zero for DOUBLE")
case("SELECT round(1.2345, 2)", "1.23")
case("SELECT ceil(-1.5), floor(-1.5)", [(-1.0, -2.0)])
case("SELECT trunc(1.9), trunc(-1.9)", [(1.0, -1.0)])
case("SELECT sign(-3), sign(0), sign(2.5)", [(-1, 0, 1.0)])
case("SELECT bit_count(7::TINYINT)", [(3,)])
case("SELECT xor(5, 3)", [(6,)])
case("SELECT @(-7)", [(7,)], "@ is abs operator")
# --- NULL handling edges ---------------------------------------------
case("SELECT coalesce(NULL, NULL, 3), nullif(2, 2), ifnull(NULL, 9)",
     [(3, None, 9)])
case("SELECT greatest(NULL, 2, 1)", [(2,)])
case("SELECT concat('a', NULL, 'b')", [('ab',)],
     "concat skips NULLs in DuckDB")
case("SELECT 'a' || NULL", [(None,)], "|| propagates NULL")
case("SELECT count(NULL)", [(0,)])
case("SELECT sum(v) FROM (VALUES (NULL::INT)) t(v)", [(None,)])
# --- boolean aggregates ----------------------------------------------
case("SELECT bool_and(v), bool_or(v) FROM (VALUES (true), (false)) "
     "t(v)", [(False, True)])
case("SELECT any_value(v) FROM (VALUES (7)) t(v)", [(7,)])
case("SELECT arg_max(a, b), arg_min(a, b) FROM (VALUES ('x', 1), "
     "('y', 2)) t(a, b)", [('y', 'x')])
case("SELECT product(v) FROM (VALUES (2), (3), (4)) t(v)", [(24.0,)])
# --- CASE forms -------------------------------------------------------
case("SELECT CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' ELSE 'c' END",
     [('b',)])
# --- COPY roundtrip ---------------------------------------------------
case("COPY (SELECT 1 a, 'x' b) TO '/tmp/probe_r5.csv' (HEADER); "
     "SELECT * FROM read_csv('/tmp/probe_r5.csv')", [(1, 'x')])
case("COPY (SELECT 2 a) TO '/tmp/probe_r5.parquet' (FORMAT PARQUET); "
     "SELECT * FROM '/tmp/probe_r5.parquet'", [(2,)])
# --- INSERT forms -----------------------------------------------------
case("CREATE TABLE ins1(a INT, b INT); INSERT INTO ins1 BY NAME "
     "(SELECT 2 b, 1 a); SELECT * FROM ins1", [(1, 2)])
case("CREATE TABLE ins2(a INT PRIMARY KEY, b INT); "
     "INSERT INTO ins2 VALUES (1, 1); "
     "INSERT INTO ins2 VALUES (1, 9) ON CONFLICT DO UPDATE SET b = 9; "
     "SELECT * FROM ins2", [(1, 9)])
case("CREATE TABLE ins3(a INT DEFAULT 5, b INT); INSERT INTO ins3(b) "
     "VALUES (1); SELECT * FROM ins3", [(5, 1)])
case("CREATE TABLE ret1(a INT); INSERT INTO ret1 VALUES (3) "
     "RETURNING a + 1", [(4,)])
# --- UPDATE/DELETE with joins ----------------------------------------
case("CREATE TABLE upd1(a INT, b INT); INSERT INTO upd1 VALUES (1, 0), "
     "(2, 0); UPDATE upd1 SET b = a * 10 WHERE a > 1; "
     "SELECT * FROM upd1 ORDER BY a", [(1, 0), (2, 20)])
# --- describe / pragmas ----------------------------------------------
case("CREATE TABLE d1(x INT, y VARCHAR); "
     "SELECT column_name, column_type FROM (DESCRIBE d1)",
     [('x', 'INTEGER'), ('y', 'VARCHAR')])
# --- information_schema ----------------------------------------------
case("CREATE TABLE info1(x INT); SELECT count(*) FROM "
     "information_schema.tables WHERE table_name = 'info1'", [(1,)])
# --- casts and renders ------------------------------------------------
case("SELECT CAST(1.9 AS INT), CAST(-1.9 AS INT)", [(2, -2)],
     "DuckDB rounds on float->int cast")
case("SELECT CAST('  42  ' AS INT)", [(42,)], "trim on cast")
case("SELECT CAST('true' AS BOOLEAN), CAST('0' AS BOOLEAN)",
     [(True, False)])
case("SELECT CAST(TIMESTAMP '2024-01-02 03:04:05' AS DATE)",
     "2024-01-02")
case("SELECT CAST(DATE '2024-01-02' AS TIMESTAMP)",
     "2024-01-02 00:00:00")
case("SELECT '5' + 3", [(8,)], "string implicit cast in arithmetic")
case("SELECT 1 = '1'", [(True,)])
# --- list/aggregate interplay ----------------------------------------
case("SELECT histogram(v) FROM (VALUES (1), (1), (2)) t(v)",
     [({1: 2, 2: 1},)])
case("SELECT list_aggregate([1, 2, 3], 'sum')", [(6,)])
case("SELECT list_sum([1, 2, 3]), list_avg([1.0, 2.0, 3.0])",
     [(6, 2.0)])
case("SELECT array_agg(v) FROM (VALUES (1), (2)) t(v)", [([1, 2],)])
# --- misc -------------------------------------------------------------
case("SELECT current_schema()", [('main',)])
case("SELECT typeof(NULL), typeof([1,2]), typeof({'a': 1})",
     [('"NULL"', 'INTEGER[]', 'STRUCT(a INTEGER)')])
case("SELECT md5('abc')", [('900150983cd24fb0d6963f7d28e17f72',)])
case("SELECT hash('x') = hash('x')", [(True,)])
case("SELECT uuid() != uuid()", [(True,)])
case("SELECT gen_random_uuid() IS NOT NULL", [(True,)])
case("VALUES (1, 2), (3, 4)", [(1, 2), (3, 4)], "bare VALUES statement")
case("FROM (VALUES (9)) t(v) SELECT v", [(9,)], "FROM-first syntax")
case("FROM (VALUES (8)) t(v)", [(8,)], "FROM-only syntax")
case("SELECT if(1 < 2, 'y', 'n')", [('y',)])
case("SELECT least_common_multiple(4, 6), greatest_common_divisor(12, 8)",
     [(12, 4)])
case("SELECT alias(42)", None, "must not crash hard")
case("SELECT version() IS NOT NULL", [(True,)])



# ===================== wave 2 =========================================
# --- NULL semantics edges --------------------------------------------
case("SELECT 1 IN (2, NULL), 1 NOT IN (2, NULL), 2 IN (2, NULL)",
     [(None, None, True)])
case("SELECT 1 / 0, 1 % 0, 1 // 0", [(None, None, None)],
     "DuckDB returns NULL on division by zero")
case("SELECT NULL AND false, NULL AND true, NULL OR true, NULL OR false",
     [(False, None, True, None)])
# --- interval literal forms ------------------------------------------
case("SELECT INTERVAL '1 year 2 months 3 days'",
     "1 year 2 months 3 days")
case("SELECT INTERVAL '90' SECOND", "00:01:30")
case("SELECT INTERVAL 3 MONTH + INTERVAL 5 DAY", "3 months 5 days")
case("SELECT TIMESTAMP '2024-01-02 10:00:00' - TIMESTAMP "
     "'2024-01-01 08:30:00'", "1 day 01:30:00")
case("SELECT DATE '2024-03-01' - DATE '2024-02-01'", [(29,)])
# --- temporal functions ----------------------------------------------
case("SELECT date_add(DATE '2024-01-31', INTERVAL 1 MONTH)",
     "2024-02-29 00:00:00", "date_add promotes like + here")
case("SELECT today() = current_date", [(True,)])
case("SELECT date_trunc('week', DATE '2024-01-07')", "2024-01-01",
     "ISO week starts Monday; Jan 7 2024 is a Sunday")
case("SELECT to_timestamp(86400)", None, "must not crash")
case("SELECT epoch(TIMESTAMP '1970-01-02 00:00:00')", [(86400,)])
# --- trim forms -------------------------------------------------------
case("SELECT trim('  x  '), ltrim('  x'), rtrim('x  ')",
     [('x', 'x', 'x')])
case("SELECT trim('xxaxx', 'x')", [('a',)])
case("SELECT trim(BOTH 'x' FROM 'xxaxx')", [('a',)])
case("SELECT trim(LEADING 'x' FROM 'xxaxx')", [('axx',)])
case("SELECT trim(TRAILING 'x' FROM 'xxaxx')", [('xxa',)])
# --- string operators -------------------------------------------------
case("SELECT 'abc' ^@ 'ab', starts_with('abc', 'b')", [(True, False)])
case("SELECT 'abc' ILIKE 'AB%', 'abc' SIMILAR TO 'a.c'", [(True, True)])
case("SELECT 'a' || 1", [('a1',)], "concat casts numeric to string")
case("SELECT array_to_string([1, 2, 3], '-')", [('1-2-3',)])
case("SELECT string_to_array('a,b', ',')", [(['a', 'b'],)])
case("SELECT reverse('abc'), upper('ab'), lower('AB'), initcap('ab cd')",
     [('cba', 'AB', 'ab', 'Ab Cd')])
case("SELECT contains('hello', 'ell'), suffix('hello', 'llo')",
     [(True, True)])
case("SELECT strpos('hello', 'l'), instr('hello', 'l')", [(3, 3)])
case("SELECT substr('hello', 2, 3), substr('hello', -3, 2)",
     [('ell', 'll')])
case("SELECT concat_ws('-', 'a', NULL, 'b')", [('a-b',)])
# --- blob / encodings -------------------------------------------------
case("SELECT octet_length('\\xAA\\xBB'::BLOB)", [(2,)])
case("SELECT to_hex(255), from_hex('ff')", None, "must not crash")
case("SELECT encode('ab'), decode('ab'::BLOB)", None, "must not crash")
case("SELECT base64('ab'::BLOB), from_base64('YWI=')", None,
     "must not crash")
# --- casts ------------------------------------------------------------
case("SELECT [1, 2]::DOUBLE[]", [([1.0, 2.0],)])
case("SELECT typeof([1, 2]::DOUBLE[])", [('DOUBLE[]',)])
case("SELECT typeof(3000000000), typeof(2147483647), typeof(32767)",
     [('BIGINT', 'INTEGER', 'INTEGER')])
case("SELECT typeof(1.5::FLOAT), typeof(1.5::REAL)", [('FLOAT', 'FLOAT')])
case("SELECT '2024-01-01'::DATE < '2024-06-01'", [(True,)])
case("SELECT CAST('inf' AS DOUBLE) > 1e300", [(True,)])
case("SELECT CAST(true AS INT), CAST(1 AS BOOLEAN)", [(1, True)])
# --- scalar subqueries -----------------------------------------------
case("SELECT (SELECT 42)", [(42,)])
case("SELECT (SELECT NULL) IS NULL", [(True,)])
# --- FETCH FIRST / LIMIT ALL -----------------------------------------
case("SELECT v FROM (VALUES (1), (2), (3)) t(v) ORDER BY v "
     "FETCH FIRST 2 ROWS ONLY", [(1,), (2,)])
case("SELECT count(*) FROM (SELECT * FROM generate_series(1, 5) "
     "LIMIT ALL) t", [(5,)])
# --- named windows ----------------------------------------------------
case("SELECT v, sum(v) OVER w FROM (VALUES (1), (2)) t(v) "
     "WINDOW w AS (ORDER BY v) ORDER BY v", [(1, 1), (2, 3)])
# --- ORDER BY ALL DESC / GROUP BY cube -------------------------------
case("SELECT v FROM (VALUES (1), (3), (2)) t(v) ORDER BY ALL DESC",
     [(3,), (2,), (1,)])
case("SELECT count(*) FROM (SELECT a, b, count(*) FROM (VALUES (1, 2)) "
     "t(a, b) GROUP BY CUBE (a, b)) s", [(4,)])
# --- aggregates wave 2 ------------------------------------------------
case("SELECT var_pop(v), var_samp(v) FROM (VALUES (1.0), (2.0), (3.0)) "
     "t(v)", [(2 / 3, 1.0)])
case("SELECT stddev_pop(v) FROM (VALUES (2.0), (4.0)) t(v)", [(1.0,)])
case("SELECT covar_pop(a, b), corr(a, b) FROM (VALUES (1.0, 2.0), "
     "(2.0, 4.0)) t(a, b)", [(0.5, 1.0)])
case("SELECT skewness(v) IS NOT NULL, kurtosis(v) IS NOT NULL FROM "
     "(VALUES (1.0), (2.0), (5.0), (9.0)) t(v)", [(True, True)])
case("SELECT entropy(v) > 0 FROM (VALUES (1), (2)) t(v)", [(True,)])
case("SELECT approx_count_distinct(v) FROM (VALUES (1), (1), (2)) t(v)",
     [(2,)])
case("SELECT bit_and(v), bit_or(v), bit_xor(v) FROM (VALUES (3), (5)) "
     "t(v)", [(1, 7, 6)])
case("SELECT string_agg(DISTINCT v, ',') FROM (VALUES ('a'), ('a'), "
     "('b')) t(v)", [('a,b',)])
case("SELECT first(v ORDER BY v DESC), last(v ORDER BY v DESC) FROM "
     "(VALUES (1), (2), (3)) t(v)", [(3, 1)])
# --- UNNEST forms -----------------------------------------------------
case("SELECT a, b FROM (SELECT unnest([1, 2]) a, unnest([10, 20]) b) "
     "ORDER BY a", [(1, 10), (2, 20)])
case("SELECT unnest({'x': 1, 'y': 2})", [(1, 2)],
     "struct unnest expands to columns")
case("SELECT * FROM unnest([1, 2]) ORDER BY 1", [(1,), (2,)])
# --- sequences in defaults -------------------------------------------
case("CREATE SEQUENCE ws2 START 5; CREATE TABLE seqd(id INT DEFAULT "
     "nextval('ws2'), v INT); INSERT INTO seqd(v) VALUES (1), (2); "
     "SELECT * FROM seqd ORDER BY id", [(5, 1), (6, 2)])
# --- temp tables / CTAS ----------------------------------------------
case("CREATE TEMP TABLE tt1 AS SELECT 3 x; SELECT * FROM tt1", [(3,)])
case("CREATE OR REPLACE TABLE orp AS SELECT 1 a; CREATE OR REPLACE "
     "TABLE orp AS SELECT 2 a; SELECT * FROM orp", [(2,)])
# --- comparison chains / misc ----------------------------------------
case("SELECT 2 BETWEEN 1 AND 3, 2 NOT BETWEEN 3 AND 4", [(True, True)])
case("SELECT CASE WHEN NULL THEN 1 ELSE 2 END", [(2,)])
case("SELECT greatest('a', 'b'), least(DATE '2024-01-01', "
     "DATE '2023-01-01')", None, "mixed-type extremes must not crash")
case("SELECT nullif(NULL, 1) IS NULL", [(True,)])
case("SELECT grouping_id(g) FROM (VALUES (1)) t(g) GROUP BY ROLLUP (g) "
     "ORDER BY 1", [(0,), (1,)])



# ===================== wave 3 =========================================
# --- transactions (silent no-op ROLLBACK was a wave-3 find) ----------
case("CREATE TABLE w3tx(a INT); BEGIN; INSERT INTO w3tx VALUES (1); "
     "ROLLBACK; SELECT count(*) FROM w3tx", [(0,)])
case("BEGIN; INSERT INTO w3tx VALUES (2); COMMIT; "
     "SELECT count(*) FROM w3tx", [(1,)])
case("BEGIN; UPDATE w3tx SET a = 99; ROLLBACK; SELECT a FROM w3tx",
     [(2,)])
case("BEGIN; DROP TABLE w3tx; ROLLBACK; SELECT count(*) FROM w3tx",
     [(1,)])
# --- UPDATE ... FROM --------------------------------------------------
case("CREATE TABLE w3u(a INT, b INT); INSERT INTO w3u VALUES (1, 0), "
     "(2, 0); CREATE TABLE w3s(a INT, c INT); INSERT INTO w3s VALUES "
     "(1, 9); UPDATE w3u SET b = w3s.c FROM w3s WHERE w3u.a = w3s.a; "
     "SELECT * FROM w3u ORDER BY a", [(1, 9), (2, 0)])
# --- interval quoted quantity + unit, instant difference -------------
case("SELECT INTERVAL '90' SECOND", "00:01:30")
case("SELECT TIMESTAMP '2024-01-02 10:00:00' - TIMESTAMP "
     "'2024-01-01 08:30:00'", "1 day 01:30:00")
# --- trim family ------------------------------------------------------
case("SELECT trim('xxaxx', 'x'), ltrim('xxaxx', 'x'), "
     "rtrim('xxaxx', 'x')", [('a', 'axx', 'xxa')])
case("SELECT trim(BOTH 'x' FROM 'xxaxx'), trim(LEADING 'x' FROM "
     "'xxaxx'), trim(TRAILING 'x' FROM 'xxaxx')", [('a', 'axx', 'xxa')])
# --- new scalar coverage ---------------------------------------------
case("SELECT array_to_string([1, 2, 3], '-'), initcap('ab cd')",
     [('1-2-3', 'Ab Cd')])
case("SELECT from_hex('6162')::VARCHAR", [('ab',)])
case("SELECT decode(encode('héllo'))", [('héllo',)])
case("SELECT current_setting('threads') IS NOT NULL", [(True,)])
# --- FETCH / LIMIT ALL -----------------------------------------------
case("SELECT v FROM (VALUES (1), (2), (3)) t(v) ORDER BY v "
     "FETCH FIRST 2 ROWS ONLY", [(1,), (2,)])
case("SELECT v FROM (VALUES (1), (2)) t(v) ORDER BY v "
     "FETCH NEXT ROW ONLY", [(1,)])
case("SELECT count(*) FROM (SELECT * FROM generate_series(1, 5) "
     "LIMIT ALL) t", [(5,)])
# --- string_agg DISTINCT ---------------------------------------------
case("SELECT string_agg(DISTINCT v, ',') FROM (VALUES ('a'), ('a'), "
     "('b')) t(v)", [('a,b',)])
# --- table unnest -----------------------------------------------------
case("SELECT * FROM unnest([1, 2]) ORDER BY 1", [(1,), (2,)])
case("SELECT * FROM unnest([10, 20]) t(v) ORDER BY v", [(10,), (20,)])



# ===================== wave 4 =========================================
case("SELECT list_transform([10, 20], (x, i) -> x + i)", [([11, 22],)])
case("SELECT list_filter([10, 5, 30], (x, i) -> i < 3 AND x > 6)",
     [([10],)])
case("SELECT nth_value(v, 2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED "
     "PRECEDING AND UNBOUNDED FOLLOWING) FROM (VALUES (5), (6), (7)) "
     "t(v) LIMIT 1", [(6,)])
case("SELECT arg_max(a, b, 2) FROM (VALUES ('x', 1), ('y', 3), "
     "('z', 2)) t(a, b)", [(['y', 'z'],)])
case("SELECT max(b, 2), min(b, 2) FROM (VALUES (1), (3), (2)) t(b)",
     [([3, 2], [1, 2])])
case("SELECT list_concat([1], [2], [3])", [([1, 2, 3],)])
case("SELECT list_any_value([NULL, 3]), list_count([1, NULL, 2])",
     [(3, 2)])
case("SELECT list_select([10, 20, 30], [1, 3]), "
     "list_where([1, 2, 3], [true, false, true])", [([10, 30], [1, 3])])
case("SELECT list_grade_up([3, 1, 2])", [([2, 3, 1],)])
case("SELECT list_cosine_similarity([1.0, 0.0], [1.0, 0.0]), "
     "list_dot_product([1.0, 2.0], [3.0, 4.0]), "
     "list_distance([0.0, 0.0], [3.0, 4.0])", [(1.0, 11.0, 5.0)])
case("SELECT map_from_entries([{'k': 1, 'v': 'a'}])", [({1: 'a'},)])
case("SELECT map_entries(map([1], ['a']))",
     [([{'key': 1, 'value': 'a'}],)])



# ===================== wave 5 =========================================
case("CREATE TABLE w5t(a INT PRIMARY KEY, b VARCHAR); "
     "SELECT count(*) > 100 FROM duckdb_functions()", [(True,)])
case("SELECT name IS NOT NULL FROM duckdb_settings() LIMIT 1", [(True,)])
case("SELECT count(*) FROM duckdb_views()", [(0,)])
case("SELECT * FROM pragma_table_info('w5t')",
     [(0, 'a', 'INTEGER', True, None, True),
      (1, 'b', 'VARCHAR', False, None, False)])
case("SELECT library_version FROM pragma_version()", [('v1.1.3',)])
case("SELECT * FROM duckdb_schemas()", [('memory', 'main')])
case("SELECT current_schemas(false), txid_current() > 0",
     [(['main'], True)])
case("COPY (SELECT 1 a, 'xy' b) TO '/tmp/probe_w5.csv' "
     "(DELIMITER '|', HEADER false); SELECT * FROM "
     "read_csv('/tmp/probe_w5.csv', delim := '|', header := false)",
     [(1, 'xy')], "the naive ';' statement split forbids ';' literals")



# ===================== wave 6 =========================================
# --- any aggregate as a window function ------------------------------
case("SELECT string_agg(v, ',') OVER (ORDER BY v) FROM "
     "(VALUES ('a'), ('b')) t(v) ORDER BY 1", [('a',), ('a,b',)])
case("SELECT median(v) OVER (ORDER BY v ROWS BETWEEN 1 PRECEDING AND "
     "CURRENT ROW) FROM (VALUES (1.0), (2.0), (3.0)) t(v)",
     [(1.0,), (1.5,), (2.5,)])
case("SELECT stddev(v) OVER () FROM (VALUES (2.0), (4.0)) t(v) LIMIT 1",
     [(2 ** 0.5,)])
case("SELECT bool_and(v) OVER () FROM (VALUES (true), (false)) t(v) "
     "LIMIT 1", [(False,)])
case("SELECT product(v) OVER (ORDER BY v) FROM (VALUES (2.0), (3.0)) "
     "t(v) ORDER BY 1", [(2.0,), (6.0,)])
case("SELECT mode(v) OVER () FROM (VALUES (1), (1), (2)) t(v) LIMIT 1",
     [(1,)])
case("SELECT bit_xor(v) OVER () FROM (VALUES (3), (5)) t(v) LIMIT 1",
     [(6,)])
# --- trig family ------------------------------------------------------
case("SELECT sin(0.0), cos(0.0), atan2(1.0, 1.0) = pi() / 4",
     [(0.0, 1.0, True)])
case("SELECT round(asin(1.0), 10) = round(pi() / 2, 10), "
     "acos(1.0), atan(0.0)", [(True, 0.0, 0.0)])
case("SELECT sinh(0.0), cosh(0.0), tanh(0.0), cbrt(27.0)",
     [(0.0, 1.0, 0.0, 3.0)])
case("SELECT gamma(5), even(2.5), even(-2.5)", [(24.0, 4.0, -4.0)])
# --- nested ORDER BY --------------------------------------------------
case("SELECT v FROM (VALUES ([2, 1]), ([1, 5]), ([1])) t(v) ORDER BY v",
     [([1],), ([1, 5],), ([2, 1],)])
case("SELECT v FROM (VALUES ([1, NULL]), ([1, 2])) t(v) ORDER BY v",
     [([1, 2],), ([1, None],)])
case("SELECT v FROM (VALUES ({'a': 2}), ({'a': 1})) t(v) "
     "ORDER BY v DESC", [({'a': 2},), ({'a': 1},)])



# ===================== wave 7 =========================================
case("SELECT 1 NOT IN (SELECT NULL::INT), 1 IN (SELECT NULL::INT)",
     [(None, None)])
case("SET threads = 4; SELECT current_setting('threads')", [('4',)])
case("RESET threads; SELECT current_setting('threads')", [('1',)])
case("SELECT typeof(-170141183460469231731687303715884105728), "
     "typeof(340282366920938463463374607431768211456)",
     [('DOUBLE', 'DOUBLE')])
case("SELECT typeof(170141183460469231731687303715884105727)",
     [('HUGEINT',)])
case("SELECT TRY_CAST(1e39 AS HUGEINT)", [(None,)])
case("SELECT * EXCLUDE (y) REPLACE (x*2 AS x) FROM "
     "(SELECT 1 x, 2 y, 3 z)", [(2, 3)])
case("SELECT t.* EXCLUDE (a) FROM (SELECT 1 a, 2 b) t", [(2,)])
case("SELECT a FROM (VALUES (1), (2), (3)) t(a) UNION SELECT 9 "
     "INTERSECT SELECT a FROM (VALUES (1)) s(a) ORDER BY 1", [(1,)])
case("DESCRIBE SELECT 1 AS x",
     [('x', 'INTEGER', 'YES', None, None, None)])
case("SELECT sum(x) FROM (VALUES (1), (2)) t(x) HAVING sum(x) > 10", [])
case("SELECT (VALUES (7))", [(7,)])



# ===================== wave 8 =========================================
case("SELECT 0x1A, 0b101, 0xff, 1_000_000", [(26, 5, 255, 1000000)])
case("SELECT e'a\\tb'", [('a\tb',)])
case("SELECT $tag$dollar 'quoted'$tag$, $$plain$$",
     [("dollar 'quoted'", 'plain')])
case("SELECT CAST(1.25 AS DEC(4,1))", "1.3")
case("PREPARE w8p AS SELECT $1 * 2; EXECUTE w8p(21); DEALLOCATE w8p",
     [])
case("SELECT count(*) FROM generate_series(1, 100) USING SAMPLE "
     "reservoir(20 ROWS)", [(20,)])
case("SELECT col0 FROM (VALUES (1))", [(1,)])



# ===================== wave 9 =========================================
case("SELECT x FROM (VALUES (1), (1), (2)) t(x) EXCEPT ALL SELECT 1 "
     "ORDER BY 1", [(1,), (2,)])
case("SELECT x FROM (VALUES (1), (1)) t(x) INTERSECT ALL SELECT 1",
     [(1,)])
case("SELECT 'a%c' LIKE 'a!%c' ESCAPE '!', 'abc' LIKE 'a!%c' "
     "ESCAPE '!'", [(True, False)])
case("SELECT quantile_cont(x, [0.25, 0.5]) FROM (VALUES (1.0), (2.0), "
     "(3.0), (4.0)) t(x)", [([1.75, 2.5],)])
case("SELECT date_part(['year', 'month'], DATE '2024-05-01')",
     [({'year': 2024, 'month': 5},)])
case("SELECT CAST(make_time(11, 30, 59.5) AS VARCHAR)",
     "11:30:59.5")
case("SELECT typeof([0.25, 0.5]), [0.25, 0.5]",
     [('DECIMAL(3,2)[]',
       [__import__('decimal').Decimal('0.25'),
        __import__('decimal').Decimal('0.50')])], "mixed-scale unify")
case("SELECT typeof([1, 'a'])", [('VARCHAR[]',)])
case("SELECT g, count(*) FROM (VALUES ([1, 2]), ([1, 2]), ([3])) t(g) "
     "GROUP BY g ORDER BY 2 DESC", [([1, 2], 2), ([3], 1)])
case("SELECT a FROM (VALUES (1), (2)) t(a) ANTI JOIN (VALUES (1)) s(a) "
     "USING (a)", [(2,)])



# ===================== wave 10 ========================================
case("SELECT min(COLUMNS(*)) FROM (SELECT 3 a, 5 b)", [(3, 5)])
case("SELECT COLUMNS(*) + 1 FROM (SELECT 1 a, 5 b)", [(2, 6)])
case("SELECT max(COLUMNS('a.*')) FROM (SELECT 1 ab, 2 ac, 3 bz)",
     [(1, 2)])
case("SELECT CAST('[1,2]' AS INT[])", [([1, 2],)])
case("SELECT CAST('[[1],[2,3]]' AS INT[][])", [([[1], [2, 3]],)])
case("SELECT CAST('[NULL, 2]' AS INT[])", [([None, 2],)])
case("SELECT TRY_CAST('[1,x]' AS INT[])", [([1, None],)])
case("SELECT CAST('{1: one}' AS MAP(INT, VARCHAR))", [({1: 'one'},)])
case("SELECT [1.5]::INT[]", [([2],)])
case("SELECT map_concat(map([1], ['a']), map([2], ['b']))",
     [({1: 'a', 2: 'b'},)])
case("CREATE TABLE w10arr(v INT[3]); INSERT INTO w10arr VALUES "
     "([1, 2, 3]); SELECT v[2] FROM w10arr", [(2,)])
case("SELECT {'A': 1}.a", [(1,)], "struct fields case-insensitive")
case("SELECT ([1,2,3,4,5])[1:4:2]", [([1, 3],)])



# ===================== wave 11 ========================================
case("SELECT json_structure('{\"a\": 1, \"b\": [2.5]}')",
     [('{"a":"BIGINT","b":["DOUBLE"]}',)])
case("SELECT json_contains('{\"a\": {\"b\": 7}}', '7')", [(True,)])
case("SELECT row_to_json(r) FROM (SELECT 1 a, 'x' b) r",
     [('{\"a\":1,\"b\":\"x\"}',)])
case("SELECT from_json('{\"a\": \"7\"}', '{\"a\": \"INTEGER\"}')",
     [({'a': 7},)])
case("SELECT datesub('day', DATE '2024-01-01', DATE '2024-01-05'), "
     "weekday(DATE '2024-01-07')", [(4, 0)])
case("SELECT epoch_ns(TIMESTAMP '1970-01-01 00:00:01'), "
     "regexp_escape('a.b'), glob('abc', 'a*')",
     [(1000000000, 'a\\.b', True)])
case("SELECT round(jaro_similarity('MARTHA', 'MARHTA'), 4), "
     "round(jaro_winkler_similarity('MARTHA', 'MARHTA'), 4)",
     [(0.9444, 0.9611)])
case("SELECT mad(v) FROM (VALUES (1.0), (2.0), (3.0), (9.0)) t(v)",
     [(1.0,)])



# ===================== wave 12 ========================================
case("SELECT CAST(to_years(2) AS VARCHAR), CAST(to_days(5) AS VARCHAR),"
     " CAST(to_hours(4) AS VARCHAR)", [('2 years', '5 days', '04:00:00')])
case("SELECT strptime('2024-03-05', ['%d/%m/%Y', '%Y-%m-%d'])",
     "2024-03-05 00:00:00")
case("SELECT try_strptime('bogus', '%Y-%m-%d')", [(None,)])
case("SELECT dayofmonth(DATE '2024-03-05'), "
     "dayofyear(DATE '2024-03-05')", [(5, 65)])
case("SELECT current_localtimestamp() IS NOT NULL, "
     "current_localtime() IS NOT NULL", [(True, True)])
case("SELECT strftime(DATE '2024-03-05', '%-d/%-m/%Y')",
     [('5/3/2024',)])



# ===================== wave 13 ========================================
case("CREATE TABLE w13uq(a INT UNIQUE); INSERT INTO w13uq VALUES (1); "
     "SELECT count(*) FROM w13uq", [(1,)])
case("CREATE TABLE w13pa(id INT PRIMARY KEY); "
     "INSERT INTO w13pa VALUES (1); "
     "CREATE TABLE w13ch(pid INT REFERENCES w13pa(id)); "
     "INSERT INTO w13ch VALUES (1); SELECT count(*) FROM w13ch", [(1,)])


def render(rows):
    return rows


def main():
    n_pass = n_div = n_err = 0
    diverged = []
    for sql, expect, note in CASES:
        try:
            stmts = [s for s in sql.split(";") if s.strip()]
            for s in stmts[:-1]:
                con.execute(s)
            rows = con.execute(stmts[-1]).fetchall()
            if expect is None:
                n_pass += 1
                continue
            if isinstance(expect, str):
                got = str(rows[0][0])
                ok = got == expect
            else:
                ok = rows == expect
                got = rows
            if ok:
                n_pass += 1
            else:
                n_div += 1
                diverged.append((sql, expect, got, note))
                print(f"DIVERGE: {sql}\n  expect: {expect!r}\n  "
                      f"got:    {got!r}" + (f"\n  note: {note}" if note
                                            else ""))
        except Exception as e:
            n_err += 1
            diverged.append((sql, expect, f"{type(e).__name__}: {e}",
                             note))
            print(f"ERROR:   {sql}\n  {type(e).__name__}: {e}")
    print(f"\n{n_pass} pass, {n_div} diverge, {n_err} error "
          f"of {len(CASES)}")
    return 1 if (n_div or n_err) else 0


if __name__ == "__main__":
    sys.exit(main())
