"""SQLLogicTest runner.

Executes the reference's behavioral spec — the ``.test`` corpus under
reference test/sql/ (62 files, see SURVEY.md §4) — against this engine.
Supports the directives that corpus uses: ``statement ok/error [conN]``,
``query <types> [sort] [conN]``, ``require``, ``mode skip/unskip``, ``loop``,
comments, and inline expected results (including error-substring matching,
DuckDB-style).

Comparison policy: ORDERED comparison everywhere except explicit
``rowsort``/``valuesort`` directives — the corpus expectations encode the
reference's physical row order and this engine reproduces it (the
determinism contract also ties the numpy / native / device backends to one
row order). Floating-point columns compare with 1e-6 relative tolerance
(the engine's float formatting differs from DuckDB at the last ulp).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..connection import Database
from ..errors import DuckPGQError


@dataclass
class Record:
    kind: str                    # statement / query / require / mode / loop
    line: int = 0
    sql: str = ""
    expect_error: bool = False
    expected_error_text: str = ""
    type_string: str = ""
    sort_mode: str = "nosort"
    connection: str = ""
    expected: List[str] = field(default_factory=list)
    label: str = ""


@dataclass
class RecordResult:
    record: Record
    status: str                  # pass / fail / skip / error-mismatch
    message: str = ""


class TestFileResult:
    def __init__(self, path: str):
        self.path = path
        self.results: List[RecordResult] = []
        self.skipped_file: Optional[str] = None

    @property
    def failures(self) -> List[RecordResult]:
        # error-mismatch counts: expected-error TEXT is part of the
        # behavioral spec (all reference messages are reproduced verbatim)
        return [r for r in self.results
                if r.status in ("fail", "error-mismatch")]

    @property
    def passed(self) -> int:
        return sum(1 for r in self.results if r.status == "pass")

    def summary(self) -> str:
        if self.skipped_file:
            return f"SKIP {self.path}: {self.skipped_file}"
        n_fail = len(self.failures)
        return (f"{'PASS' if n_fail == 0 else 'FAIL'} {self.path}: "
                f"{self.passed} ok, {n_fail} failed, "
                f"{len(self.results)} total")


KNOWN_EXTENSIONS = {"duckpgq", "parquet", "json", "icu"}

# The corpus compares STRICTLY ORDERED except for these four queries, whose
# expected row order encodes host-engine internals that SQL semantics do not
# determine (verified case by case; everything else — 59/62 files fully —
# passes ordered). Key: (path suffix, distinguishing substring of the query
# text) — NOT line numbers, so a reference-file resync cannot silently
# relax the wrong query. run_file asserts every entry for a file actually
# matched exactly the expected number of records.
ORDER_UNDETERMINED = {
    # Organisation is populated via `SELECT .. UNION SELECT ..`; the
    # expected MATCH order follows DuckDB's hash-DISTINCT bucket layout of
    # that union (CWI before EY despite later insertion), which has no
    # SQL-level definition.  Matches the two un-ORDER-BY'd MATCH queries.
    ("pattern_matching/inheritance_support.test", "(u:company)", 1):
        "row order follows DuckDB hash-UNION layout of Organisation",
    ("pattern_matching/inheritance_support.test", "(u:COMPANY)", 1):
        "row order follows DuckDB hash-UNION layout of Organisation",
    # ORDER BY with ties between equally-shortest paths: the tie order is
    # DuckDB's sort-input (join pipeline) order, not a property of ANY
    # SHORTEST semantics.
    ("path_finding/complex_matching.test",
     "ORDER BY p3_id, p4_id, p_id", 1):
        "ORDER BY tie order among equal-length shortest paths",
    ("snb/snb_inheritance.test", "m.id = 618475290624", 1):
        "ORDER BY tie order among joined reply rows",
}


def parse_test_file(path: str) -> List[Record]:
    with open(path) as f:
        lines = f.read().split("\n")
    records: List[Record] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        stripped = line.strip()
        if not stripped or stripped.startswith("#"):
            i += 1
            continue
        parts = stripped.split()
        head = parts[0].lower()
        if head == "require":
            records.append(Record(kind="require", line=i + 1,
                                  sql=parts[1] if len(parts) > 1 else ""))
            i += 1
            continue
        if head == "require-env":
            records.append(Record(kind="require", line=i + 1, sql="__env__"))
            i += 1
            continue
        if head == "mode":
            records.append(Record(kind="mode", line=i + 1,
                                  sql=parts[1] if len(parts) > 1 else ""))
            i += 1
            continue
        if head in ("load", "restart", "reconnect"):
            records.append(Record(kind=head, line=i + 1))
            i += 1
            continue
        if head == "hash-threshold":
            i += 1
            continue
        if head in ("statement", "query"):
            rec = Record(kind=head, line=i + 1)
            if head == "statement":
                rec.expect_error = len(parts) > 1 and \
                    parts[1].lower() in ("error", "maybe")
                if len(parts) > 2:
                    rec.connection = parts[2]
            else:
                rec.type_string = parts[1] if len(parts) > 1 else ""
                for extra in parts[2:]:
                    if extra in ("nosort", "rowsort", "valuesort"):
                        rec.sort_mode = extra
                    else:
                        rec.connection = extra
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() != "----" and lines[i].strip():
                if not lines[i].strip().startswith("#"):
                    sql_lines.append(lines[i])
                i += 1
            rec.sql = "\n".join(sql_lines)
            if i < n and lines[i].strip() == "----":
                i += 1
                expected = []
                while i < n and lines[i].strip():
                    expected.append(lines[i])
                    i += 1
                if head == "statement":
                    rec.expected_error_text = "\n".join(expected)
                else:
                    rec.expected = expected
            records.append(rec)
            continue
        # unknown directive: treat the block as a skipped statement
        records.append(Record(kind="unknown", line=i + 1, sql=stripped))
        i += 1
    return records


_FLOAT_RE = re.compile(r"^-?\d+\.\d+(e[+-]?\d+)?$", re.IGNORECASE)


def _values_equal(expected: str, actual: str) -> bool:
    if expected == actual:
        return True
    if expected == "(empty)" and actual == "":
        return True
    if expected in ("NULL",) or actual in ("NULL",):
        return expected == actual
    if expected in ("true", "false") and actual in ("0", "1"):
        return (expected == "true") == (actual == "1")
    if actual in ("true", "false") and expected in ("0", "1"):
        return (actual == "true") == (expected == "1")
    # numeric tolerance
    try:
        fe, fa = float(expected), float(actual)
        if fe == fa:
            return True
        denom = max(abs(fe), abs(fa), 1e-30)
        return abs(fe - fa) / denom < 1e-6
    except ValueError:
        pass
    # list values: compare element-wise with tolerance
    if expected.startswith("[") and actual.startswith("["):
        ee = [x.strip() for x in expected[1:-1].split(",") if x.strip()]
        aa = [x.strip() for x in actual[1:-1].split(",") if x.strip()]
        if len(ee) == len(aa):
            return all(_values_equal(x, y) for x, y in zip(ee, aa))
    return False


def _row_key(row: List[str]) -> Tuple:
    out = []
    for v in row:
        try:
            out.append(("f", round(float(v), 6)))
        except ValueError:
            out.append(("s", v))
    return tuple(out)


class SQLLogicRunner:
    def __init__(self, base_path: str = "."):
        self.base_path = base_path

    def run_file(self, path: str) -> TestFileResult:
        self._current_path = path
        self._order_relaxed_hits = {}
        result = TestFileResult(path)
        records = parse_test_file(path)
        db = Database()
        db.base_path = self.base_path
        connections: Dict[str, object] = {}

        def get_con(label: str):
            key = label or "__default__"
            if key not in connections:
                connections[key] = db.connect()
            return connections[key]

        skipping = False
        for rec in records:
            if rec.kind == "mode":
                skipping = rec.sql == "skip"
                continue
            if skipping:
                continue
            if rec.kind == "require":
                if rec.sql.lower() not in KNOWN_EXTENSIONS:
                    result.skipped_file = f"require {rec.sql}"
                    return result
                continue
            if rec.kind in ("load", "restart", "reconnect"):
                db = Database()
                db.base_path = self.base_path
                connections.clear()
                continue
            if rec.kind == "unknown":
                result.results.append(RecordResult(rec, "skip",
                                                   "unknown directive"))
                continue
            con = get_con(rec.connection)
            if rec.kind == "statement":
                result.results.append(self._run_statement(con, rec))
            elif rec.kind == "query":
                result.results.append(self._run_query(con, rec))
        # every ORDER_UNDETERMINED entry for this file must have matched its
        # expected record count — a resync of the reference corpus that moves
        # or removes a query must fail loudly, not silently relax/strict-en
        # the wrong record (ADVICE r2).
        for suffix, substr, cnt in ORDER_UNDETERMINED:
            if path.endswith(suffix):
                hits = self._order_relaxed_hits.get((suffix, substr), 0)
                if hits != cnt:
                    raise AssertionError(
                        f"ORDER_UNDETERMINED entry ({suffix!r}, {substr!r}) "
                        f"matched {hits} records, expected {cnt} — the "
                        f"corpus changed; re-verify the whitelist")
        return result

    def _substitute(self, sql: str) -> str:
        if "__TEST_DIR__" in sql:
            import tempfile
            if not hasattr(self, "_test_dir"):
                self._test_dir = tempfile.mkdtemp(prefix="duckpgq_tpu_test_")
            sql = sql.replace("__TEST_DIR__", self._test_dir)
        return sql

    def _run_statement(self, con, rec: Record) -> RecordResult:
        try:
            con.execute(self._substitute(rec.sql))
            if rec.expect_error:
                return RecordResult(rec, "fail",
                                    "expected error but statement succeeded")
            return RecordResult(rec, "pass")
        except DuckPGQError as e:
            if rec.expect_error:
                if rec.expected_error_text and \
                        rec.expected_error_text not in str(e):
                    return RecordResult(
                        rec, "error-mismatch",
                        f"expected error containing "
                        f"{rec.expected_error_text!r}, got {e}")
                return RecordResult(rec, "pass")
            return RecordResult(rec, "fail", f"unexpected error: {e}")
        except Exception as e:  # engine bug surfaced as non-SQL error
            if rec.expect_error:
                return RecordResult(
                    rec, "error-mismatch",
                    f"error raised but not a SQL error: {type(e).__name__} "
                    f"{e}")
            return RecordResult(rec, "fail",
                                f"internal error: {type(e).__name__}: {e}")

    def _run_query(self, con, rec: Record) -> RecordResult:
        try:
            res = con.execute(self._substitute(rec.sql))
            actual_rows = res.rows_as_strings()
        except Exception as e:
            return RecordResult(rec, "fail", f"query failed: {e}")
        n_cols = len(res.columns)
        # parse expected: either tab-separated rows or one value per line
        expected_rows: List[List[str]] = []
        if rec.expected and "values hashing to" in rec.expected[0]:
            return RecordResult(rec, "skip", "hash results not supported")
        if rec.expected:
            if "\t" in rec.expected[0] or n_cols == 1:
                for line in rec.expected:
                    expected_rows.append(line.split("\t"))
            else:
                # single-column-per-line layout
                vals = list(rec.expected)
                for i in range(0, len(vals), n_cols):
                    expected_rows.append(vals[i:i + n_cols])
        if len(expected_rows) != len(actual_rows):
            return RecordResult(
                rec, "fail",
                f"row count mismatch: expected {len(expected_rows)}, "
                f"got {len(actual_rows)}\nfirst rows: "
                f"{actual_rows[:5]} vs expected {expected_rows[:5]}")
        relaxed = False
        for suffix, substr, _cnt in ORDER_UNDETERMINED:
            if self._current_path.endswith(suffix) and substr in rec.sql:
                relaxed = True
                self._order_relaxed_hits[(suffix, substr)] = \
                    self._order_relaxed_hits.get((suffix, substr), 0) + 1
        if rec.sort_mode == "rowsort" or relaxed:
            expected_rows = sorted(expected_rows)
            actual_sorted = sorted(actual_rows)
            pairs = list(zip(expected_rows, actual_sorted))
        else:
            # nosort = ordered compare (sqllogictest semantics): the
            # expectations encode the reference's physical row order, which
            # is part of the behavioral spec here — all engine backends
            # must produce it (CLAUDE.md determinism invariant). The only
            # allowed slack is the float ulp tolerance in _values_equal.
            pairs = list(zip(expected_rows, actual_rows))
        for erow, arow in pairs:
            if len(erow) != len(arow) or not all(
                    _values_equal(e, x) for e, x in zip(erow, arow)):
                return RecordResult(
                    rec, "fail",
                    f"row mismatch: expected {erow}, got {arow}")
        return RecordResult(rec, "pass")


def run_corpus(root: str, base_path: str = ".", pattern: str = "**/*.test"
               ) -> List[TestFileResult]:
    import glob
    runner = SQLLogicRunner(base_path)
    out = []
    for path in sorted(glob.glob(os.path.join(root, pattern),
                                 recursive=True)):
        out.append(runner.run_file(path))
    return out
