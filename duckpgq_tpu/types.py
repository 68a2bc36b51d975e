"""Logical type system for the TPU-native engine.

Capability-equivalent to the SQL types exercised by the reference test corpus
(BIGINT/INTEGER/VARCHAR/DOUBLE/FLOAT/BOOLEAN/DATE/TIMESTAMP_MS/LIST/STRUCT —
see reference data/SNB0.003/schema.sql and test/sql/**).  Storage mapping is
columnar numpy; numeric columns are convertible to JAX device arrays for the
TPU compute path.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field
from enum import Enum
from typing import Optional, Tuple

import numpy as np


class TypeId(Enum):
    SQLNULL = "NULL"
    BOOLEAN = "BOOLEAN"
    TINYINT = "TINYINT"
    SMALLINT = "SMALLINT"
    INTEGER = "INTEGER"
    BIGINT = "BIGINT"
    HUGEINT = "HUGEINT"
    UTINYINT = "UTINYINT"
    USMALLINT = "USMALLINT"
    UINTEGER = "UINTEGER"
    UBIGINT = "UBIGINT"
    FLOAT = "FLOAT"
    DOUBLE = "DOUBLE"
    DECIMAL = "DECIMAL"
    VARCHAR = "VARCHAR"
    BLOB = "BLOB"
    DATE = "DATE"
    TIME = "TIME"
    TIMESTAMP = "TIMESTAMP"
    TIMESTAMP_MS = "TIMESTAMP_MS"
    TIMESTAMP_NS = "TIMESTAMP_NS"
    TIMESTAMP_S = "TIMESTAMP_S"
    TIMESTAMP_TZ = "TIMESTAMP WITH TIME ZONE"
    INTERVAL = "INTERVAL"
    LIST = "LIST"
    STRUCT = "STRUCT"
    MAP = "MAP"
    JSON = "JSON"    # host: JSON logical type over VARCHAR storage
    BIT = "BIT"      # host: bitstring (stored as '0'/'1' text here)
    ENUM = "ENUM"    # CREATE TYPE ... AS ENUM
    USERREF = "USERREF"  # unresolved user-type name (bound at execution)


_INTEGRAL = {
    TypeId.TINYINT, TypeId.SMALLINT, TypeId.INTEGER, TypeId.BIGINT,
    TypeId.HUGEINT, TypeId.UTINYINT, TypeId.USMALLINT, TypeId.UINTEGER,
    TypeId.UBIGINT,
}
_FLOATING = {TypeId.FLOAT, TypeId.DOUBLE}
_TEMPORAL = {
    TypeId.DATE, TypeId.TIME, TypeId.TIMESTAMP, TypeId.TIMESTAMP_MS,
    TypeId.TIMESTAMP_NS, TypeId.TIMESTAMP_S, TypeId.TIMESTAMP_TZ,
    TypeId.INTERVAL,
}

# DuckDB's interval_t: (months, days, micros) — calendar months/days are NOT
# normalized to micros (reference grammar: expression.gram interval units;
# DuckDB src/common/types/interval.cpp). Stored as a numpy structured dtype so
# interval columns stay vectorized.
INTERVAL_DTYPE = np.dtype(
    [("months", "<i8"), ("days", "<i8"), ("micros", "<i8")])

_NUMPY_DTYPE = {
    TypeId.BOOLEAN: np.bool_,
    TypeId.TINYINT: np.int8,
    TypeId.SMALLINT: np.int16,
    TypeId.INTEGER: np.int32,
    TypeId.BIGINT: np.int64,
    # HUGEINT is a real 128-bit integer: object-dtype Python ints (exact
    # arithmetic; numpy astype(object) yields Python int, so vectorized
    # object math never wraps). Host DuckDB: common/types/hugeint.cpp.
    TypeId.HUGEINT: object,
    TypeId.UTINYINT: np.uint8,
    TypeId.USMALLINT: np.uint16,
    TypeId.UINTEGER: np.uint32,
    TypeId.UBIGINT: np.uint64,
    TypeId.FLOAT: np.float32,
    TypeId.DOUBLE: np.float64,
    # DECIMAL(p,s) is a SCALED INTEGER (value * 10^s): int64 for p<=18,
    # object Python ints for p in (18, 38]. numpy_dtype() special-cases on
    # width; this entry is the p<=18 default.
    TypeId.DECIMAL: np.int64,
    TypeId.DATE: np.int32,        # days since epoch
    TypeId.TIME: np.int64,        # micros since midnight
    TypeId.TIMESTAMP: np.int64,   # micros since epoch
    TypeId.TIMESTAMP_MS: np.int64,  # millis since epoch
    TypeId.TIMESTAMP_NS: np.int64,
    TypeId.TIMESTAMP_S: np.int64,
    TypeId.TIMESTAMP_TZ: np.int64,  # micros since epoch, UTC instant
    TypeId.INTERVAL: INTERVAL_DTYPE,
    TypeId.VARCHAR: object,
    TypeId.BLOB: object,
    TypeId.SQLNULL: object,
    TypeId.JSON: object,
    TypeId.BIT: object,
    TypeId.ENUM: object,
}

# Promotion lattice for binary numeric ops (smaller rank promotes to larger).
_NUMERIC_RANK = {
    TypeId.BOOLEAN: 0,
    TypeId.TINYINT: 1, TypeId.UTINYINT: 2, TypeId.SMALLINT: 3,
    TypeId.USMALLINT: 4, TypeId.INTEGER: 5, TypeId.UINTEGER: 6,
    TypeId.BIGINT: 7, TypeId.UBIGINT: 8, TypeId.HUGEINT: 9,
    TypeId.DECIMAL: 10, TypeId.FLOAT: 11, TypeId.DOUBLE: 12,
}


@dataclass(frozen=True)
class LogicalType:
    id: TypeId
    child: Optional["LogicalType"] = None                 # LIST element type
    fields: Optional[Tuple[Tuple[str, "LogicalType"], ...]] = None  # STRUCT
    width: int = 0     # DECIMAL width
    scale: int = 0     # DECIMAL scale
    values: Optional[Tuple[str, ...]] = None   # ENUM members (defn order)
    type_name: str = ""                        # ENUM catalog name

    # ---- predicates -------------------------------------------------------
    @property
    def is_numeric(self) -> bool:
        return self.id in _NUMERIC_RANK

    @property
    def is_integral(self) -> bool:
        return self.id in _INTEGRAL

    @property
    def is_floating(self) -> bool:
        return self.id in _FLOATING

    @property
    def is_temporal(self) -> bool:
        return self.id in _TEMPORAL

    @property
    def is_nested(self) -> bool:
        return self.id in (TypeId.LIST, TypeId.STRUCT, TypeId.MAP)

    def numpy_dtype(self):
        if self.id == TypeId.DECIMAL and self.width > 18:
            return object          # int128-class widths: exact Python ints
        return _NUMPY_DTYPE.get(self.id, object)

    # ---- rendering --------------------------------------------------------
    def __str__(self) -> str:
        if self.id == TypeId.LIST:
            return f"{self.child}[]"
        if self.id == TypeId.STRUCT:
            inner = ", ".join(f"{n} {t}" for n, t in (self.fields or ()))
            return f"STRUCT({inner})"
        if self.id == TypeId.MAP:
            return f"MAP({self.fields[0][1]}, {self.fields[1][1]})"
        if self.id == TypeId.DECIMAL:
            return f"DECIMAL({self.width},{self.scale})"
        if self.id == TypeId.ENUM:
            if self.type_name:
                return self.type_name
            inner = ", ".join(f"'{v}'" for v in (self.values or ()))
            return f"ENUM({inner})"
        return self.id.value

    def __repr__(self) -> str:
        return str(self)


# Canonical singletons --------------------------------------------------------
SQLNULL = LogicalType(TypeId.SQLNULL)
BOOLEAN = LogicalType(TypeId.BOOLEAN)
TINYINT = LogicalType(TypeId.TINYINT)
SMALLINT = LogicalType(TypeId.SMALLINT)
INTEGER = LogicalType(TypeId.INTEGER)
BIGINT = LogicalType(TypeId.BIGINT)
HUGEINT = LogicalType(TypeId.HUGEINT)
UBIGINT = LogicalType(TypeId.UBIGINT)
FLOAT = LogicalType(TypeId.FLOAT)
DOUBLE = LogicalType(TypeId.DOUBLE)
VARCHAR = LogicalType(TypeId.VARCHAR)
BLOB = LogicalType(TypeId.BLOB)
DATE = LogicalType(TypeId.DATE)
TIME = LogicalType(TypeId.TIME)
TIMESTAMP = LogicalType(TypeId.TIMESTAMP)
TIMESTAMP_MS = LogicalType(TypeId.TIMESTAMP_MS)
TIMESTAMP_S = LogicalType(TypeId.TIMESTAMP_S)
TIMESTAMP_NS = LogicalType(TypeId.TIMESTAMP_NS)
TIMESTAMP_TZ = LogicalType(TypeId.TIMESTAMP_TZ)
INTERVAL = LogicalType(TypeId.INTERVAL)


def LIST(child: LogicalType) -> LogicalType:
    return LogicalType(TypeId.LIST, child=child)


def STRUCT(fields) -> LogicalType:
    return LogicalType(TypeId.STRUCT, fields=tuple((n, t) for n, t in fields))


def MAP(key: LogicalType, value: LogicalType) -> LogicalType:
    """MAP type; values are stored as python dicts (insertion-ordered)."""
    return LogicalType(TypeId.MAP, fields=(("key", key), ("value", value)))


def DECIMAL(width: int, scale: int) -> LogicalType:
    return LogicalType(TypeId.DECIMAL, width=width, scale=scale)


JSON = LogicalType(TypeId.JSON)
BIT = LogicalType(TypeId.BIT)


def ENUM(values, name: str = "") -> LogicalType:
    return LogicalType(TypeId.ENUM, values=tuple(values), type_name=name)


# User-defined types created via CREATE TYPE ... AS ENUM. Process-global
# (the hand parser resolves type names without a catalog handle); names are
# lower-cased. CREATE TYPE re-registration follows DuckDB conflict rules at
# the executor level.
USER_TYPES: dict = {}


def resolve_user_type(t: LogicalType) -> LogicalType:
    """Late-bind a USERREF placeholder (unknown type name at parse time)
    against the user-type catalog — host semantics: type names resolve at
    bind time, so CREATE TYPE + use in one batch works and a typo is a
    Catalog Error, not a parse error."""
    if t.id != TypeId.USERREF:
        return t
    real = USER_TYPES.get(t.type_name.lower())
    if real is None:
        from .errors import CatalogException
        raise CatalogException(
            f"Type with name {t.type_name} does not exist!")
    return real


_NAME_TO_TYPE = {
    "BOOLEAN": BOOLEAN, "BOOL": BOOLEAN, "LOGICAL": BOOLEAN,
    "TINYINT": TINYINT, "INT1": TINYINT,
    "SMALLINT": SMALLINT, "INT2": SMALLINT, "SHORT": SMALLINT,
    "INTEGER": INTEGER, "INT": INTEGER, "INT4": INTEGER, "SIGNED": INTEGER,
    "BIGINT": BIGINT, "INT8": BIGINT, "LONG": BIGINT,
    "HUGEINT": HUGEINT, "INT128": HUGEINT,
    "UTINYINT": LogicalType(TypeId.UTINYINT),
    "USMALLINT": LogicalType(TypeId.USMALLINT),
    "UINTEGER": LogicalType(TypeId.UINTEGER),
    "UBIGINT": UBIGINT,
    "FLOAT": FLOAT, "FLOAT4": FLOAT, "REAL": FLOAT,
    "DOUBLE": DOUBLE, "FLOAT8": DOUBLE,
    "DECIMAL": DECIMAL(18, 3), "NUMERIC": DECIMAL(18, 3),
    "VARCHAR": VARCHAR, "TEXT": VARCHAR, "STRING": VARCHAR, "CHAR": VARCHAR,
    "BPCHAR": VARCHAR,
    "BLOB": BLOB, "BYTEA": BLOB,
    "JSON": JSON,
    "BIT": BIT, "BITSTRING": BIT,
    "DATE": DATE,
    "TIME": TIME,
    "TIMESTAMP": TIMESTAMP, "DATETIME": TIMESTAMP,
    "TIMESTAMP_MS": TIMESTAMP_MS,
    "TIMESTAMP_S": TIMESTAMP_S,
    "TIMESTAMP_NS": TIMESTAMP_NS,
    "TIMESTAMPTZ": TIMESTAMP_TZ,
    "TIMESTAMP WITH TIME ZONE": TIMESTAMP_TZ,
    "INTERVAL": INTERVAL,
}


def type_from_name(name: str) -> Optional[LogicalType]:
    t = _NAME_TO_TYPE.get(name.upper())
    if t is None:
        t = USER_TYPES.get(name.lower())
    return t


# Value bounds of each integer type (HUGEINT is DuckDB's int128 whose
# minimum is reserved as invalid, hence the +1).
INT_BOUNDS = {
    TypeId.TINYINT: (-(1 << 7), (1 << 7) - 1),
    TypeId.SMALLINT: (-(1 << 15), (1 << 15) - 1),
    TypeId.INTEGER: (-(1 << 31), (1 << 31) - 1),
    TypeId.BIGINT: (-(1 << 63), (1 << 63) - 1),
    TypeId.HUGEINT: (-(1 << 127) + 1, (1 << 127) - 1),
    TypeId.UTINYINT: (0, (1 << 8) - 1),
    TypeId.USMALLINT: (0, (1 << 16) - 1),
    TypeId.UINTEGER: (0, (1 << 32) - 1),
    TypeId.UBIGINT: (0, (1 << 64) - 1),
}

# Physical type names used in DuckDB's overflow messages
# ("Overflow in addition of INT32 (...)").
INT_TYPE_NAME = {
    TypeId.TINYINT: "INT8", TypeId.SMALLINT: "INT16",
    TypeId.INTEGER: "INT32", TypeId.BIGINT: "INT64",
    TypeId.HUGEINT: "INT128", TypeId.UTINYINT: "UINT8",
    TypeId.USMALLINT: "UINT16", TypeId.UINTEGER: "UINT32",
    TypeId.UBIGINT: "UINT64",
}


# Decimal width needed to represent each integer type exactly (DuckDB
# DecimalType / hugeint: TINYINT->3 ... BIGINT->19, HUGEINT->38-capped).
_INT_DECIMAL_WIDTH = {
    TypeId.BOOLEAN: 1, TypeId.TINYINT: 3, TypeId.UTINYINT: 3,
    TypeId.SMALLINT: 5, TypeId.USMALLINT: 5, TypeId.INTEGER: 10,
    TypeId.UINTEGER: 10, TypeId.BIGINT: 19, TypeId.UBIGINT: 20,
    TypeId.HUGEINT: 38,
}


def decimal_shape(t: LogicalType):
    """(width, scale) of a type viewed as a decimal (integers are scale-0)."""
    if t.id == TypeId.DECIMAL:
        return t.width, t.scale
    return _INT_DECIMAL_WIDTH[t.id], 0


def max_numeric_type(a: LogicalType, b: LogicalType) -> LogicalType:
    """Result type of arithmetic between numeric types (promotion lattice)."""
    if a.id == TypeId.SQLNULL:
        return b
    if b.id == TypeId.SQLNULL:
        return a
    ra, rb = _NUMERIC_RANK.get(a.id, -1), _NUMERIC_RANK.get(b.id, -1)
    if ra < 0 or rb < 0:
        raise TypeError(f"non-numeric types {a} and {b}")
    if TypeId.DECIMAL in (a.id, b.id):
        # decimal vs float loses exactness -> DOUBLE; decimal vs decimal /
        # integral widens to the covering DECIMAL (DuckDB MaxLogicalType)
        if a.id in _FLOATING or b.id in _FLOATING:
            return DOUBLE
        wa, sa = decimal_shape(a)
        wb, sb = decimal_shape(b)
        s = max(sa, sb)
        w = min(38, max(wa - sa, wb - sb) + s)
        return DECIMAL(w, s)
    winner = a if ra >= rb else b
    # mixed signed/unsigned of same width promotes to next signed
    return winner


# ---------------------------------------------------------------------------
# Value rendering (DuckDB-compatible text output used by the sqllogictest
# harness and result display).
# ---------------------------------------------------------------------------

_EPOCH = datetime.date(1970, 1, 1)


def _civil_from_days(z: int):
    """Days-since-epoch -> (y, m, d) without datetime range limits
    (Howard Hinnant's civil_from_days algorithm)."""
    z += 719468
    era = (z if z >= 0 else z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + 3 if mp < 10 else mp - 9
    return (y + (1 if m <= 2 else 0), m, d)


def civil_from_days_np(z):
    """Vectorized days-since-epoch -> (y, m, d) int64 arrays."""
    z = np.asarray(z, np.int64) + 719468
    era = np.where(z >= 0, z, z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = np.where(mp < 10, mp + 3, mp - 9)
    return y + (m <= 2), m, d


def days_from_civil_np(y, m, d):
    """Vectorized (y, m, d) -> days-since-epoch (Hinnant days_from_civil)."""
    y = np.asarray(y, np.int64) - (np.asarray(m) <= 2)
    m = np.asarray(m, np.int64)
    d = np.asarray(d, np.int64)
    era = np.where(y >= 0, y, y - 399) // 400
    yoe = y - era * 400
    mp = np.where(m > 2, m - 3, m + 9)
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def add_months_to_days(days, months):
    """Calendar month addition on days-since-epoch with DuckDB's end-of-month
    clamping (2020-01-31 + 1 month = 2020-02-29)."""
    y, m, d = civil_from_days_np(days)
    tot = (y * 12 + (m - 1)) + np.asarray(months, np.int64)
    ny, nm = tot // 12, tot % 12 + 1
    leap = ((ny % 4 == 0) & (ny % 100 != 0)) | (ny % 400 == 0)
    dim = np.choose(nm - 1,
                    [np.full_like(ny, 31), np.where(leap, 29, 28)] +
                    [np.full_like(ny, n)
                     for n in (31, 30, 31, 30, 31, 31, 30, 31, 30, 31)])
    return days_from_civil_np(ny, nm, np.minimum(d, dim))


def value_to_string(value, typ: LogicalType) -> str:
    """Render a single (non-NULL) value the way the host engine's test runner
    renders it (reference test expectations, e.g. floats as repr, structs as
    {'k': v, ...})."""
    if value is None:
        return "NULL"
    t = typ.id
    if t == TypeId.BOOLEAN:
        return "true" if value else "false"
    if t in _INTEGRAL:
        return str(int(value))
    if t == TypeId.DECIMAL:
        # scaled-integer rendering with the full declared scale (DuckDB
        # Decimal::ToString: DECIMAL(4,2) 1.5 renders "1.50")
        v = int(value)
        s = typ.scale
        if s == 0:
            return str(v)
        sign = "-" if v < 0 else ""
        av = abs(v)
        return f"{sign}{av // 10 ** s}.{av % 10 ** s:0{s}d}"
    if t == TypeId.FLOAT:
        return repr(float(np.float32(value)))
    if t == TypeId.DOUBLE:
        return repr(float(value))
    if t == TypeId.VARCHAR:
        return str(value)
    if t == TypeId.BLOB:
        # DuckDB Blob::ToString: printable ASCII as-is, rest as \xHH
        b = value if isinstance(value, (bytes, bytearray)) \
            else str(value).encode()
        return "".join(chr(c) if 32 <= c <= 126 and c != 0x5C
                       else f"\\x{c:02X}" for c in b)
    if t == TypeId.DATE:
        y, m, d = _civil_from_days(int(value))
        return f"{y:04d}-{m:02d}-{d:02d}"
    if t == TypeId.TIME:
        rem = int(value)
        secs, frac = divmod(rem, 1_000_000)
        hh, rest = divmod(secs, 3600)
        mm, ss = divmod(rest, 60)
        out = f"{hh:02d}:{mm:02d}:{ss:02d}"
        if frac:
            out += ("." + f"{frac:06d}").rstrip("0")
        return out
    if t == TypeId.INTERVAL:
        months, idays, micros = interval_parts(value)
        # DuckDB Interval::ToString (src/common/types/interval.cpp): each
        # component keeps its own sign; time part prints when micros != 0 or
        # the whole interval is zero.
        parts = []
        years, mon = int(months) // 12, int(months) % 12
        if months < 0 and mon:          # C-style trunc toward zero
            years, mon = -((-int(months)) // 12), -((-int(months)) % 12)
        if years:
            parts.append(f"{years} year" + ("s" if abs(years) != 1 else ""))
        if mon:
            parts.append(f"{mon} month" + ("s" if abs(mon) != 1 else ""))
        if idays:
            parts.append(f"{idays} day" + ("s" if abs(idays) != 1 else ""))
        if micros or not parts:
            sign = "-" if micros < 0 else ""
            rem = abs(int(micros))
            secs, frac = divmod(rem, 1_000_000)
            hh, rest = divmod(secs, 3600)
            mm, ss = divmod(rest, 60)
            tpart = f"{sign}{hh:02d}:{mm:02d}:{ss:02d}"
            if frac:
                tpart += ("." + f"{frac:06d}").rstrip("0")
            parts.append(tpart)
        return " ".join(parts)
    if t == TypeId.TIMESTAMP_TZ:
        # rendered as a UTC instant with explicit offset (session tz = UTC)
        micros = int(value)
        days, rem = divmod(micros, 86_400_000_000)
        y, m, d = _civil_from_days(days)
        secs, frac = divmod(rem, 1_000_000)
        hh, rest = divmod(secs, 3600)
        mm, ss = divmod(rest, 60)
        out = f"{y:04d}-{m:02d}-{d:02d} {hh:02d}:{mm:02d}:{ss:02d}"
        if frac:
            out += ("." + f"{frac:06d}").rstrip("0")
        return out + "+00"
    if t in (TypeId.TIMESTAMP, TypeId.TIMESTAMP_MS, TypeId.TIMESTAMP_S,
             TypeId.TIMESTAMP_NS):
        micros = int(value)
        if t == TypeId.TIMESTAMP_MS:
            micros *= 1000
        elif t == TypeId.TIMESTAMP_S:
            micros *= 1_000_000
        elif t == TypeId.TIMESTAMP_NS:
            micros //= 1000
        days, rem = divmod(micros, 86_400_000_000)
        y, m, d = _civil_from_days(days)
        secs, frac = divmod(rem, 1_000_000)
        hh, rest = divmod(secs, 3600)
        mm, ss = divmod(rest, 60)
        out = f"{y:04d}-{m:02d}-{d:02d} {hh:02d}:{mm:02d}:{ss:02d}"
        if frac:
            out += ("." + f"{frac:06d}").rstrip("0")
        return out
    if t == TypeId.LIST:
        inner = ", ".join(
            "NULL" if v is None else value_to_string(v, typ.child) for v in value
        )
        return f"[{inner}]"
    if t == TypeId.STRUCT:
        if typ.fields and all(not name for name, _ in typ.fields):
            # unnamed struct (row(...)): host renders (v1, v2, ...)
            parts = ["NULL" if v is None else value_to_string(v, ft)
                     for (_, ft), v in zip(typ.fields, value)]
            return "(" + ", ".join(parts) + ")"
        parts = []
        for (name, ft), v in zip(typ.fields or (), value):
            sv = "NULL" if v is None else value_to_string(v, ft)
            parts.append(f"'{name}': {sv}")
        return "{" + ", ".join(parts) + "}"
    if t == TypeId.MAP:
        kt, vt = typ.fields[0][1], typ.fields[1][1]
        parts = []
        for k, v in value.items():
            sv = "NULL" if v is None else value_to_string(v, vt)
            parts.append(f"{value_to_string(k, kt)}={sv}")
        return "{" + ", ".join(parts) + "}"
    return str(value)


_INTERVAL_UNIT_MICROS = {
    "microsecond": 1,
    "us": 1,
    "millisecond": 1_000,
    "ms": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
}

_INTERVAL_UNIT_DAYS = {"day": 1, "week": 7}

_INTERVAL_UNIT_MONTHS = {
    "month": 1, "mon": 1, "quarter": 3, "year": 12, "decade": 120,
    "century": 1200, "centurie": 1200,   # "centuries" minus trailing s
    "millennium": 12000, "millennia": 12000,
}

DAY_MICROS = 86_400_000_000
MONTH_DAYS = 30  # DuckDB Interval::GetMicro normalization for compare/sort


class Interval:
    """Client-side interval value (months, days, micros kept separate like
    the host's interval_t — calendar parts never normalize to micros)."""

    __slots__ = ("months", "days", "micros")

    def __init__(self, months: int, days: int, micros: int):
        self.months = int(months)
        self.days = int(days)
        self.micros = int(micros)

    def _key(self):
        return (self.months, self.days, self.micros)

    def __eq__(self, other):
        if isinstance(other, Interval):
            return self._key() == other._key()
        if isinstance(other, (tuple, list)) and len(other) == 3:
            return self._key() == tuple(int(x) for x in other)
        return NotImplemented

    def __hash__(self):
        return hash(self._key())

    def __repr__(self):
        return (f"Interval(months={self.months}, days={self.days}, "
                f"micros={self.micros})")

    def __str__(self):
        return value_to_string(self._key(), INTERVAL)

    def total_microseconds(self) -> int:
        """Comparison normalization (months ~ 30 days), matching the
        host's Interval::GetMicro."""
        return int(interval_total_micros(self.months, self.days,
                                         self.micros))


def interval_parts(value):
    """(months, days, micros) from an interval value (structured numpy scalar,
    tuple, or legacy plain micros int)."""
    if isinstance(value, (tuple, list)):
        return int(value[0]), int(value[1]), int(value[2])
    if isinstance(value, np.void):
        return int(value["months"]), int(value["days"]), int(value["micros"])
    return 0, 0, int(value)  # legacy micros


def interval_value(qty: float, unit: str):
    """INTERVAL literal as DuckDB's interval_t triple (months, days, micros).
    Fractional calendar quantities spill downward (1.5 MONTH = 1 mon 15 days),
    matching DuckDB's interval parser."""
    from .errors import ParserException
    u = unit.lower()
    if u.endswith("s") and u not in ("us", "ms", "millennias"):
        u = u[:-1]
    months = days = micros = 0
    if u in _INTERVAL_UNIT_MONTHS:
        mf = qty * _INTERVAL_UNIT_MONTHS[u]
        months = int(mf)
        days = int(round((mf - months) * MONTH_DAYS))
    elif u in _INTERVAL_UNIT_DAYS:
        df = qty * _INTERVAL_UNIT_DAYS[u]
        days = int(df)
        micros = int(round((df - days) * DAY_MICROS))
    elif u in _INTERVAL_UNIT_MICROS:
        micros = int(round(qty * _INTERVAL_UNIT_MICROS[u]))
    else:
        raise ParserException(f"unknown INTERVAL unit \"{unit}\"")
    return (months, days, micros)


def interval_from_string(text: str):
    """Parse "N unit [N unit ...] [HH:MM:SS[.f]]" interval text to a
    (months, days, micros) triple (DuckDB Interval::FromCString)."""
    from .errors import ConversionException
    parts = text.split()
    months = days = micros = 0
    i = 0
    if not parts:
        raise ConversionException(
            f"Could not convert string \"{text}\" to INTERVAL")
    while i < len(parts):
        tok = parts[i]
        if ":" in tok:  # bare time component
            neg = tok.startswith("-")
            body = tok[1:] if neg else tok
            segs = body.split(":")
            try:
                hh = int(segs[0]); mm = int(segs[1]) if len(segs) > 1 else 0
                ss = float(segs[2]) if len(segs) > 2 else 0.0
            except ValueError:
                raise ConversionException(
                    f"Could not convert string \"{text}\" to INTERVAL")
            t = int(round(((hh * 60 + mm) * 60 + ss) * 1_000_000))
            micros += -t if neg else t
            i += 1
            continue
        if i + 1 >= len(parts):
            raise ConversionException(
                f"Could not convert string \"{text}\" to INTERVAL")
        try:
            qty = float(tok)
        except ValueError:
            raise ConversionException(
                f"Could not convert string \"{text}\" to INTERVAL")
        try:
            m, d, us = interval_value(qty, parts[i + 1])
        except Exception:
            raise ConversionException(
                f"Could not convert string \"{text}\" to INTERVAL")
        months += m
        days += d
        micros += us
        i += 2
    return (months, days, micros)


def interval_total_micros(months, days, micros):
    """DuckDB's comparison/sort normalization (months ~ 30 days)."""
    return (np.asarray(months, np.int64) * MONTH_DAYS
            + np.asarray(days, np.int64)) * DAY_MICROS \
        + np.asarray(micros, np.int64)
