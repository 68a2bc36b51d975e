"""Exception hierarchy mirroring the error classes the reference surfaces as SQL
errors (DuckDB exception types observed in test expectations, e.g.
``Binder Error: ...``, ``Constraint Error: ...``, ``Invalid Error: ...``).

Reference behavior: errors are C++ exceptions rendered with a ``<Kind> Error:``
prefix by the host engine (see e.g. reference test
test/sql/pattern_matching/basic_match.test "Binder Error: Property doesnotexist
is never registered!").
"""

from __future__ import annotations


class DuckPGQError(Exception):
    """Base class; ``prefix`` matches the host engine's error rendering."""

    prefix = "Error"

    def __init__(self, message: str):
        self.message = message
        super().__init__(f"{self.prefix}: {message}")


class ParserException(DuckPGQError):
    prefix = "Parser Error"


class SyntaxException(DuckPGQError):
    prefix = "Syntax Error"


class BinderException(DuckPGQError):
    prefix = "Binder Error"


class CatalogException(DuckPGQError):
    prefix = "Catalog Error"


class ConstraintException(DuckPGQError):
    prefix = "Constraint Error"


class InvalidInputException(DuckPGQError):
    prefix = "Invalid Input Error"


class InvalidException(DuckPGQError):
    """Reference's InvalidErrorType (e.g. property-graph lookup failures in the
    algorithm table functions: "Invalid Error: Property graph ... not found")."""

    prefix = "Invalid Error"


class NotImplementedException(DuckPGQError):
    prefix = "Not implemented Error"


class InternalException(DuckPGQError):
    prefix = "INTERNAL Error"


class ConversionException(DuckPGQError):
    prefix = "Conversion Error"


class IOException(DuckPGQError):
    prefix = "IO Error"


class OutOfRangeException(DuckPGQError):
    prefix = "Out of Range Error"
