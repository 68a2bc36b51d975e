"""Typed client fetch layer (VERDICT r4 item 8): fetchall()/fetchone()
return the Python values the reference host's client would produce —
datetime.date/datetime/time, tz-aware TIMESTAMP_TZ, Interval, Decimal,
dicts for STRUCT/MAP — while raw=True keeps the engine representations
(the sqllogictest runner renders via rows_as_strings and is unaffected).
"""

import datetime
from decimal import Decimal

import duckpgq_tpu
from duckpgq_tpu.types import Interval


def q(sql):
    return duckpgq_tpu.connect().execute(sql)


def test_date_time_timestamp_typed():
    assert q("SELECT DATE '2020-02-29'").fetchall() == \
        [(datetime.date(2020, 2, 29),)]
    assert q("SELECT TIME '13:37:42.5'").fetchall() == \
        [(datetime.time(13, 37, 42, 500000),)]
    assert q("SELECT TIMESTAMP '2020-01-01 12:00:00.25'").fetchall() == \
        [(datetime.datetime(2020, 1, 1, 12, 0, 0, 250000),)]


def test_timestamp_tz_is_aware():
    (v,), = q("SELECT TIMESTAMP '2020-01-01 00:00:00' AT TIME ZONE 'UTC'"
              ).fetchall()
    assert v.tzinfo is not None
    assert v == datetime.datetime(2020, 1, 1,
                                  tzinfo=datetime.timezone.utc)


def test_interval_typed():
    (v,), = q("SELECT INTERVAL 2 MONTH + INTERVAL 3 DAY").fetchall()
    assert isinstance(v, Interval)
    assert (v.months, v.days, v.micros) == (2, 3, 0)
    assert v == (2, 3, 0)          # tuple-compat equality
    assert str(v) == "2 months 3 days"


def test_decimal_typed():
    assert q("SELECT CAST(1.555 AS DECIMAL(4,2))").fetchall() == \
        [(Decimal("1.56"),)]
    assert q("SELECT 0.1 + 0.2").fetchall() == [(Decimal("0.3"),)]
    (v,), = q("SELECT sum(x) FROM (VALUES (1.5),(2.25)) t(x)").fetchall()
    assert v == Decimal("3.75")


def test_struct_map_list_typed():
    assert q("SELECT {'a': 1, 'b': [DATE '2020-01-01']}").fetchall() == \
        [({"a": 1, "b": [datetime.date(2020, 1, 1)]},)]
    assert q("SELECT map([1, 2], ['x', 'y'])").fetchall() == \
        [({1: "x", 2: "y"},)]
    assert q("SELECT [1.5, 2.5]").fetchall() == \
        [([Decimal("1.5"), Decimal("2.5")],)]


def test_raw_flag_keeps_engine_representation():
    assert q("SELECT DATE '1970-01-02'").fetchall(raw=True) == [(1,)]
    assert q("SELECT CAST(1.5 AS DECIMAL(4,2))").fetchall(raw=True) == \
        [(150,)]
    assert q("SELECT {'a': 1}").fetchall(raw=True) == [((1,),)]


def test_fetchone_typed():
    assert q("SELECT DATE '2020-01-01'").fetchone() == \
        (datetime.date(2020, 1, 1),)
    assert q("SELECT 1 WHERE 1 = 0").fetchone() is None


def test_passthrough_rows_untouched():
    assert q("SELECT 1, 'x', 1.5::DOUBLE, NULL").fetchall() == \
        [(1, "x", 1.5, None)]
