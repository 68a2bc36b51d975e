"""Vectorized casts between logical types (DuckDB-compatible semantics for the
type surface the test corpus uses)."""

from __future__ import annotations

import datetime
import re

import numpy as np

from ..errors import ConversionException
from ..storage.vector import Vector
from ..types import (BIGINT, BOOLEAN, DOUBLE, FLOAT, INTEGER, LogicalType,
                     TypeId, VARCHAR, value_to_string)

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)


def _parse_date(s: str) -> int:
    try:
        y, m, d = s.strip().split("-")
        return (datetime.date(int(y), int(m), int(d)) - _EPOCH_DATE).days
    except Exception as e:
        raise ConversionException(
            f"Could not convert string '{s}' to DATE") from e


def _parse_timestamp(s: str) -> int:
    """Returns micros since epoch."""
    s = s.strip()
    try:
        if "T" in s:
            date_part, time_part = s.split("T", 1)
        elif " " in s:
            date_part, time_part = s.split(" ", 1)
        else:
            date_part, time_part = s, "00:00:00"
        days = _parse_date(date_part)
        frac = 0
        if "." in time_part:
            time_part, frac_s = time_part.split(".", 1)
            frac = int(frac_s.ljust(6, "0")[:6])
        hh, mm, ss = (time_part.split(":") + ["0", "0"])[:3]
        hh, mm, ss = int(hh), int(mm), int(ss)
        if not (0 <= mm < 60 and 0 <= ss < 60 and
                (0 <= hh < 24 or (hh == 24 and mm == 0 and ss == 0
                                  and frac == 0))):
            # out-of-range time fields error like the host (24:00:00
            # exactly is the one allowed overflow form)
            raise ConversionException(
                f"Could not convert string '{s}' to TIMESTAMP")
        micros = ((hh * 60 + mm) * 60 + ss) * 1_000_000 + frac
        return days * 86_400_000_000 + micros
    except ConversionException:
        raise
    except Exception as e:
        raise ConversionException(
            f"Could not convert string '{s}' to TIMESTAMP") from e


def _round_div_halfaway(x, d):
    """x / d rounded half away from zero on integer arrays (int64 or object
    Python ints); d is a positive Python int power of ten."""
    ax = np.abs(x)
    q = (ax + d // 2) // d
    return np.where(x < 0, -q, q)


def _decimal_overflow(value_repr, target):
    return ConversionException(
        f"Could not cast value {value_repr} to {target}")


def _cast_to_decimal(vec: Vector, target: LogicalType, try_cast: bool
                     ) -> Vector:
    """numeric -> DECIMAL(p,s): scaled-integer conversion with
    half-away-from-zero rounding and width enforcement (host DuckDB
    decimal_cast semantics)."""
    from ..types import value_to_string
    p, s = target.width, target.scale
    src = vec.type
    validity = vec.validity.copy()
    obj = target.numpy_dtype() is object or vec.data.dtype == object
    lim = 10 ** p

    if src.id == TypeId.DECIMAL:
        s0 = src.scale
        data = vec.data.astype(object) if obj else vec.data.astype(np.int64)
        if s >= s0:
            scaled = data * (10 ** (s - s0))
        else:
            scaled = _round_div_halfaway(data, 10 ** (s0 - s))
    elif src.is_floating:
        f = vec.data.astype(np.float64) * float(10 ** s)
        bad = ~np.isfinite(f) & validity
        if bad.any():
            if not try_cast:
                raise _decimal_overflow(
                    repr(float(vec.data[np.flatnonzero(bad)[0]])), target)
            validity &= ~bad
            f = np.where(bad, 0.0, f)
        rounded = np.where(f >= 0, np.floor(f + 0.5), np.ceil(f - 0.5))
        over = (np.abs(rounded) >= float(lim)) & validity
        if over.any():
            if not try_cast:
                i = int(np.flatnonzero(over)[0])
                raise _decimal_overflow(repr(float(vec.data[i])), target)
            validity &= ~over
            rounded = np.where(over, 0.0, rounded)
        if obj:
            scaled = np.array([int(v) for v in rounded], dtype=object)
        else:
            scaled = rounded.astype(np.int64)
        return Vector(target, scaled, validity)
    else:  # integral / boolean
        base = vec.data.astype(object) if obj else vec.data.astype(np.int64)
        # check the integer part BEFORE scaling (avoids int64 overflow in
        # the multiply)
        int_lim = 10 ** (p - s)
        over = (np.abs(base) >= int_lim) & validity
        if over.any():
            if not try_cast:
                i = int(np.flatnonzero(over)[0])
                raise _decimal_overflow(str(int(vec.data[i])), target)
            validity &= ~over
            base = np.where(over, 0, base)
        scaled = base * (10 ** s)
        return Vector(target, scaled, validity)

    over = (np.abs(scaled) >= lim) & validity
    if over.any():
        if not try_cast:
            i = int(np.flatnonzero(over)[0])
            raise _decimal_overflow(value_to_string(vec.value(i), src), target)
        validity &= ~over
        scaled = np.where(over, 0, scaled)
    if not obj and scaled.dtype == object:
        scaled = scaled.astype(np.int64)
    return Vector(target, scaled, validity)


from ..types import INT_BOUNDS as _INT_BOUNDS  # noqa: E402


def _cast_from_decimal(vec: Vector, target: LogicalType, try_cast: bool
                       ) -> Vector:
    """DECIMAL(p,s) -> integral/float/boolean."""
    from ..types import value_to_string
    s = vec.type.scale
    den = 10 ** s
    validity = vec.validity.copy()
    if target.is_floating:
        out = vec.data.astype(np.float64) / float(den)
        return Vector(target, out.astype(target.numpy_dtype()), validity)
    if target.id == TypeId.BOOLEAN:
        return Vector(target, np.asarray(vec.data != 0, dtype=bool), validity)
    if target.is_integral:
        data = vec.data if vec.data.dtype == object \
            else vec.data.astype(np.int64)
        unscaled = _round_div_halfaway(data, den)
        lo, hi = _INT_BOUNDS[target.id]
        over = ((unscaled < lo) | (unscaled > hi)) & validity
        if over.any():
            if not try_cast:
                i = int(np.flatnonzero(over)[0])
                raise _decimal_overflow(
                    value_to_string(vec.value(i), vec.type), target)
            validity &= ~over
            unscaled = np.where(over, 0, unscaled)
        if target.numpy_dtype() is object:
            out = unscaled.astype(object)
        else:
            out = unscaled.astype(target.numpy_dtype())
        return Vector(target, out, validity)
    raise ConversionException(f"Unimplemented cast {vec.type} -> {target}")


def _blob_from_string(s: str) -> bytes:
    """VARCHAR -> BLOB cast: utf8 bytes with DuckDB \\xHH escapes decoded."""
    buf = bytearray()
    i, n = 0, len(s)
    while i < n:
        if s[i] == "\\" and i + 3 < n and s[i + 1] == "x":
            try:
                buf.append(int(s[i + 2:i + 4], 16))
                i += 4
                continue
            except ValueError:
                pass
        buf.extend(s[i].encode("utf-8"))
        i += 1
    return bytes(buf)


def cast_vector(vec: Vector, target: LogicalType, try_cast: bool = False
                ) -> Vector:
    if target.id == TypeId.USERREF:
        from ..types import resolve_user_type
        target = resolve_user_type(target)
    src = vec.type
    if src.id == target.id and src == target:
        return vec
    n = len(vec)
    if src.id == TypeId.SQLNULL:
        return Vector.constant(None, target, n)

    # constant vectors (comparison/coercion of literals against columns):
    # cast the single value once and broadcast — a VARCHAR timestamp
    # literal in a BETWEEN filter was re-parsed for every one of 21M rows
    # (172 of BI17's 174 s at SF0.3)
    if n > 1 and getattr(vec, "constant_hint", False):
        one = cast_vector(Vector(src, vec.data[:1], vec.validity[:1].copy()),
                          target, try_cast)
        val = one.value(0) if one.validity[0] else None
        return Vector.constant(val, target, n)

    # to VARCHAR: render values
    if target.id == TypeId.VARCHAR:
        data = np.empty(n, dtype=object)
        for i in range(n):
            if vec.validity[i]:
                data[i] = value_to_string(vec.value(i), src)
        return Vector(target, data, vec.validity.copy())

    # from VARCHAR: parse
    if src.id == TypeId.VARCHAR and target.id in (
            TypeId.LIST, TypeId.STRUCT, TypeId.MAP):
        # nested-literal parse ('[1, 2]', "{'a': 1}") — must run before
        # the scalar from-VARCHAR lattice below
        out = np.empty(n, dtype=object)
        validity = vec.validity.copy()
        for i in range(n):
            if not validity[i]:
                continue
            try:
                parsed = _parse_nested_text(str(vec.data[i]))
                out[i] = _text_to_raw(parsed, target, try_cast)
            except (ConversionException, ValueError) as exc:
                if try_cast:
                    validity[i] = False
                    continue
                raise ConversionException(
                    f"Could not convert string '{vec.data[i]}' to "
                    f"{target}") from exc
        return Vector(target, out, validity)
    if src.id == TypeId.VARCHAR:
        out = np.zeros(n, dtype=target.numpy_dtype()) \
            if target.numpy_dtype() is not object else np.empty(n, dtype=object)
        validity = vec.validity.copy()
        # memoize temporal parses: repeated date strings in real columns
        # (and any constant vector that slipped past the hint) parse once
        _memo = {}

        def _parse_timestamp(s, _raw=globals()["_parse_timestamp"]):
            v = _memo.get(s)
            if v is None:
                v = _memo[s] = _raw(s)
            return v

        def _parse_date(s, _raw=globals()["_parse_date"]):
            v = _memo.get(s)
            if v is None:
                v = _memo[s] = _raw(s)
            return v

        for i in range(n):
            if not validity[i]:
                continue
            s = vec.data[i]
            try:
                if target.id == TypeId.BOOLEAN:
                    ls = str(s).strip().lower()
                    if ls in ("true", "t", "1"):
                        out[i] = True
                    elif ls in ("false", "f", "0"):
                        out[i] = False
                    else:
                        raise ConversionException(
                            f"Could not convert string '{s}' to BOOLEAN")
                elif target.is_integral:
                    txt = str(s).strip()
                    try:
                        v = int(txt)        # exact (float corrupts >2^53)
                    except ValueError:
                        f = float(txt)
                        if f != int(f):
                            raise ConversionException(
                                f"Could not convert string '{s}' to "
                                f"{target}")
                        v = int(f)
                    lo, hi = _INT_BOUNDS[target.id]
                    if not lo <= v <= hi:
                        raise ConversionException(
                            f"Could not convert string '{s}' to {target}")
                    out[i] = v
                elif target.id == TypeId.DECIMAL:
                    import decimal as _dec
                    try:
                        d = _dec.Decimal(str(s).strip())
                    except _dec.InvalidOperation as exc:
                        raise ConversionException(
                            f"Could not convert string '{s}' to {target}"
                        ) from exc
                    v = int(d.scaleb(target.scale).to_integral_value(
                        rounding=_dec.ROUND_HALF_UP))
                    if abs(v) >= 10 ** target.width:
                        raise ConversionException(
                            f"Could not cast value {str(s).strip()} to "
                            f"{target}")
                    out[i] = v
                elif target.is_floating:
                    out[i] = float(str(s).strip())
                elif target.id == TypeId.DATE:
                    out[i] = _parse_date(str(s))
                elif target.id == TypeId.TIME:
                    txt = str(s).strip()
                    try:
                        frac = 0
                        if "." in txt:
                            txt, frac_s = txt.split(".", 1)
                            frac = int(frac_s.ljust(6, "0")[:6])
                        hh, mm, ss = (txt.split(":") + ["0", "0"])[:3]
                        out[i] = ((int(hh) * 60 + int(mm)) * 60 +
                                  int(ss)) * 1_000_000 + frac
                    except Exception as exc:
                        raise ConversionException(
                            f"Could not convert string '{s}' to TIME"
                        ) from exc
                elif target.id == TypeId.TIMESTAMP:
                    out[i] = _parse_timestamp(str(s))
                elif target.id == TypeId.TIMESTAMP_MS:
                    out[i] = _parse_timestamp(str(s)) // 1000
                elif target.id == TypeId.TIMESTAMP_S:
                    out[i] = _parse_timestamp(str(s)) // 1_000_000
                elif target.id == TypeId.TIMESTAMP_NS:
                    out[i] = _parse_timestamp(str(s)) * 1000
                elif target.id == TypeId.TIMESTAMP_TZ:
                    txt = str(s).strip()
                    off = 0
                    m = re.search(r"([+-])(\d{2})(?::?(\d{2}))?$", txt)
                    if m and ("+" in txt[10:] or txt[10:].count("-")):
                        off = (int(m.group(2)) * 3600 +
                               int(m.group(3) or 0) * 60) * 1_000_000
                        if m.group(1) == "-":
                            off = -off
                        txt = txt[:m.start()].strip()
                    out[i] = _parse_timestamp(txt) - off
                elif target.id == TypeId.INTERVAL:
                    from ..types import interval_from_string
                    out[i] = interval_from_string(str(s))
                elif target.id == TypeId.BLOB:
                    out[i] = _blob_from_string(str(s))
                elif target.id == TypeId.ENUM:
                    if str(s) not in (target.values or ()):
                        raise ConversionException(
                            f"Could not convert string '{s}' to {target}")
                    out[i] = str(s)
                elif target.id == TypeId.JSON:
                    import json as _json
                    try:
                        _json.loads(str(s))
                    except ValueError:
                        raise ConversionException(
                            f"Malformed JSON: could not convert string "
                            f"'{s}' to JSON")
                    out[i] = str(s)
                elif target.id == TypeId.BIT:
                    txt = str(s)
                    if not txt or any(c not in "01" for c in txt):
                        raise ConversionException(
                            f"Could not convert string '{s}' to BIT")
                    out[i] = txt
                else:
                    raise ConversionException(
                        f"Unimplemented cast VARCHAR -> {target}")
            except (ValueError, ConversionException):
                if try_cast:
                    validity[i] = False
                else:
                    raise ConversionException(
                        f"Could not convert string '{s}' to {target}")
        return Vector(target, out, validity)

    # scaled-integer DECIMAL paths (before the generic numeric lattice)
    if target.id == TypeId.DECIMAL and \
            (src.is_numeric or src.id == TypeId.BOOLEAN):
        return _cast_to_decimal(vec, target, try_cast)
    if src.id == TypeId.DECIMAL and \
            (target.is_numeric or target.id == TypeId.BOOLEAN):
        return _cast_from_decimal(vec, target, try_cast)

    # numeric <-> numeric / boolean
    if (src.is_numeric or src.id == TypeId.BOOLEAN) and \
            (target.is_numeric or target.id == TypeId.BOOLEAN):
        dtype = target.numpy_dtype()
        if target.id == TypeId.HUGEINT:
            # object-backed exact ints
            if src.is_floating:
                f = vec.data.astype(np.float64)
                r = np.where(f >= 0, np.floor(f + 0.5), np.ceil(f - 0.5))
                out = np.array([int(v) if np.isfinite(v) else 0
                                for v in r], dtype=object)
                validity = vec.validity.copy()
                h_lo, h_hi = -(1 << 127) + 1, (1 << 127) - 1
                bad = np.array([(validity[i] and
                                 (not np.isfinite(f[i]) or
                                  not h_lo <= out[i] <= h_hi))
                                for i in range(len(out))], dtype=bool)
                if bad.any():
                    if not try_cast:
                        i = int(np.flatnonzero(bad)[0])
                        raise ConversionException(
                            f"Could not cast value {f[i]} to INT128")
                    validity &= ~bad
                return Vector(target, out, validity)
            out = vec.data.astype(object)
            out = np.array([int(v) for v in out], dtype=object)
            return Vector(target, out, vec.validity.copy())
        if src.id == TypeId.HUGEINT and target.is_integral:
            lo, hi = _INT_BOUNDS[target.id]
            validity = vec.validity.copy()
            data = vec.data
            over = np.zeros(n, dtype=bool)
            for i in np.flatnonzero(validity):
                if not lo <= data[i] <= hi:
                    over[i] = True
            if over.any():
                if not try_cast:
                    i = int(np.flatnonzero(over)[0])
                    raise ConversionException(
                        f"Could not cast value {data[i]} to {target}")
                validity &= ~over
            safe = np.where(over | ~validity, 0, data)
            return Vector(target, safe.astype(dtype), validity)
        if target.is_integral and src.is_floating:
            # DuckDB rounds float->int casts HALF AWAY FROM ZERO
            # (8.5 -> 9, -7.5 -> -8); np.round would do banker's rounding
            f = vec.data.astype(np.float64)
            data = np.where(vec.validity,
                            np.where(f >= 0, np.floor(f + 0.5),
                                     np.ceil(f - 0.5)), 0)
            out = data.astype(dtype)
        elif target.id == TypeId.BOOLEAN:
            out = vec.data.astype(np.float64) != 0
        else:
            out = vec.data.astype(dtype)
        return Vector(target, out, vec.validity.copy())

    # temporal conversions (INTERVAL is a span, not an instant: no casts
    # to/from the instant types — clean error instead of a scale KeyError)
    if TypeId.INTERVAL in (src.id, target.id):
        raise ConversionException(f"Unimplemented cast {src} -> {target}")
    if src.is_temporal and target.is_temporal:
        scale = {TypeId.TIMESTAMP_S: 1_000_000, TypeId.TIMESTAMP_MS: 1000,
                 TypeId.TIMESTAMP: 1, TypeId.TIMESTAMP_TZ: 1,
                 TypeId.TIMESTAMP_NS: 0.001}
        if src.id == TypeId.DATE:
            micros = vec.data.astype(np.int64) * 86_400_000_000
        else:
            micros = (vec.data.astype(np.float64) * scale[src.id]).astype(np.int64)
        if target.id == TypeId.DATE:
            out = (micros // 86_400_000_000).astype(np.int32)
        else:
            out = (micros / scale[target.id]).astype(np.int64)
        return Vector(target, out, vec.validity.copy())
    if src.is_temporal and target.id == TypeId.BIGINT:
        return Vector(target, vec.data.astype(np.int64), vec.validity.copy())

    # ENUM <-> ENUM / string-ish (validate membership); JSON/BIT from their
    # own kind pass through (text storage)
    if target.id == TypeId.ENUM and src.id in (TypeId.ENUM, TypeId.JSON):
        allowed = set(target.values or ())
        validity = vec.validity.copy()
        out = np.empty(n, dtype=object)
        for i in range(n):
            if validity[i]:
                v = str(vec.data[i])
                if v not in allowed:
                    if try_cast:
                        validity[i] = False
                        continue
                    raise ConversionException(
                        f"Could not convert string '{v}' to {target}")
                out[i] = v
        return Vector(target, out, validity)
    if src.id == TypeId.ENUM and target.id == TypeId.JSON:
        return cast_vector(cast_vector(vec, VARCHAR), target, try_cast)
    if src.id in (TypeId.JSON, TypeId.BIT) and target.id == src.id:
        return Vector(target, vec.data, vec.validity.copy())

    # list -> list (element cast)
    if src.id == TypeId.LIST and target.id == TypeId.LIST:
        sc, tc = src.child, target.child
        if sc is None or tc is None or sc == tc or \
                sc.id == TypeId.SQLNULL:
            return Vector(target, vec.data, vec.validity.copy())
        out = np.empty(n, dtype=object)
        for i in range(n):
            if vec.validity[i] and vec.data[i] is not None:
                elems = list(vec.data[i])
                ev = cast_vector(Vector.from_values(elems, sc), tc,
                                 try_cast)
                out[i] = [ev.value(j) for j in range(len(elems))]
        return Vector(target, out, vec.validity.copy())

    raise ConversionException(f"Unimplemented cast {src} -> {target}")


def _parse_nested_text(s: str):
    """Parse a DuckDB nested-value literal ('[1, 2]', "{'a': {'b': 3}}",
    'NULL') into str atoms / lists / dicts / None."""
    pos = [0]
    n = len(s)

    def skip_ws():
        while pos[0] < n and s[pos[0]] in " \t\r\n":
            pos[0] += 1

    def parse_value():
        skip_ws()
        if pos[0] >= n:
            raise ValueError("unexpected end of nested literal")
        c = s[pos[0]]
        if c == "[":
            pos[0] += 1
            items = []
            skip_ws()
            if pos[0] < n and s[pos[0]] == "]":
                pos[0] += 1
                return items
            while True:
                items.append(parse_value())
                skip_ws()
                if pos[0] < n and s[pos[0]] == ",":
                    pos[0] += 1
                    continue
                if pos[0] < n and s[pos[0]] == "]":
                    pos[0] += 1
                    return items
                raise ValueError("expected ',' or ']'")
        if c == "{":
            pos[0] += 1
            fields = {}
            skip_ws()
            if pos[0] < n and s[pos[0]] == "}":
                pos[0] += 1
                return fields
            while True:
                key = parse_value()
                skip_ws()
                if pos[0] >= n or s[pos[0]] != ":":
                    raise ValueError("expected ':' in struct literal")
                pos[0] += 1
                fields[str(key)] = parse_value()
                skip_ws()
                if pos[0] < n and s[pos[0]] == ",":
                    pos[0] += 1
                    continue
                if pos[0] < n and s[pos[0]] == "}":
                    pos[0] += 1
                    return fields
                raise ValueError("expected ',' or '}'")
        if c in "'\"":
            q = c
            pos[0] += 1
            buf = []
            while pos[0] < n:
                if s[pos[0]] == q:
                    if pos[0] + 1 < n and s[pos[0] + 1] == q:
                        buf.append(q)
                        pos[0] += 2
                        continue
                    pos[0] += 1
                    return "".join(buf)
                buf.append(s[pos[0]])
                pos[0] += 1
            raise ValueError("unterminated string in nested literal")
        # bare atom up to a delimiter
        j = pos[0]
        while j < n and s[j] not in ",]}:":
            j += 1
        atom = s[pos[0]:j].strip()
        pos[0] = j
        if atom.upper() == "NULL":
            return None
        return atom

    v = parse_value()
    skip_ws()
    if pos[0] != n:
        raise ValueError("trailing characters in nested literal")
    return v


def _text_to_raw(v, typ, try_cast: bool):
    """Convert a parsed nested-literal node to the RAW storage value of
    ``typ`` (scalar leaves cast through cast_vector)."""
    if v is None:
        return None
    if typ.id == TypeId.LIST:
        if not isinstance(v, list):
            raise ValueError("expected a list")
        child = typ.child or VARCHAR
        return [_text_to_raw(x, child, try_cast) for x in v]
    if typ.id == TypeId.STRUCT:
        if not isinstance(v, dict):
            raise ValueError("expected a struct")
        lower = {k.lower(): x for k, x in v.items()}
        out = []
        for nm, ft in (typ.fields or ()):
            out.append(_text_to_raw(lower.get(nm.lower()), ft, try_cast))
        return tuple(out)
    if typ.id == TypeId.MAP:
        if not isinstance(v, dict):
            raise ValueError("expected a map")
        kt, vt = typ.fields[0][1], typ.fields[1][1]
        return {_text_to_raw(k, kt, try_cast): _text_to_raw(x, vt,
                                                            try_cast)
                for k, x in v.items()}
    sv = Vector.from_values([str(v)], VARCHAR)
    cv = cast_vector(sv, typ, try_cast)
    return cv.value(0)
