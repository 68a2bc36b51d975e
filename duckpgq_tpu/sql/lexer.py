"""SQL tokenizer.

A hand-written scanner for the SQL + SQL/PGQ surface the engine supports.
Keywords are not reserved at the lexer level — the parser decides contextually
(the reference's PEG grammar likewise keeps PGQ keywords contextual, cf.
reference third_party/.../grammar/statements/pgq.gram and
test/sql/pgq_keywords.test which uses keyword-ish identifiers).

Tokens carry byte offsets so the PGQ pattern parser can detect adjacency when
combining '-' '>' into an arrow (we never lex '->' as one token: it would
break ordinary comparisons like ``x < -1``).
"""

from __future__ import annotations

from enum import Enum
from typing import List, NamedTuple

from ..errors import ParserException


class T(Enum):
    IDENT = "ident"          # bare identifier / keyword
    QIDENT = "qident"        # "quoted identifier"
    STRING = "string"        # 'string literal'
    NUMBER = "number"        # integer or float literal
    OP = "op"                # operator / punctuation
    EOF = "eof"


class Token(NamedTuple):
    kind: T
    text: str        # normalized text (unquoted/unescaped for QIDENT/STRING)
    start: int       # byte offset in source
    end: int

    @property
    def upper(self) -> str:
        return self.text.upper()

    def is_kw(self, *kws: str) -> bool:
        return self.kind == T.IDENT and self.text.upper() in kws

    def is_op(self, *ops: str) -> bool:
        return self.kind == T.OP and self.text in ops


# multi-char operators, longest match first (note: no '->'/'<-' — see module doc)
_MULTI_OPS = ["!~~*", "~~*", "!~~", "~~", "!~*", "~*", "!~", "^@",
              "::", "<=", ">=", "<>", "!=", "==", "||", "**", "//",
              "<<", ">>"]
_SINGLE_OPS = set("()[]{},;.*+-/%<>=|&~^?:$#@!")


def tokenize(sql: str) -> List[Token]:
    tokens: List[Token] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        # whitespace
        if c in " \t\r\n":
            i += 1
            continue
        # line comment
        if c == "-" and i + 1 < n and sql[i + 1] == "-":
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        # block comment
        if c == "/" and i + 1 < n and sql[i + 1] == "*":
            j = sql.find("*/", i + 2)
            if j < 0:
                raise ParserException("unterminated block comment")
            i = j + 2
            continue
        # string literal
        if c == "'":
            j = i + 1
            buf = []
            while True:
                if j >= n:
                    raise ParserException("unterminated string literal")
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(sql[j])
                j += 1
            tokens.append(Token(T.STRING, "".join(buf), i, j + 1))
            i = j + 1
            continue
        # quoted identifier
        if c == '"':
            j = i + 1
            buf = []
            while True:
                if j >= n:
                    raise ParserException("unterminated quoted identifier")
                if sql[j] == '"':
                    if j + 1 < n and sql[j + 1] == '"':
                        buf.append('"')
                        j += 2
                        continue
                    break
                buf.append(sql[j])
                j += 1
            tokens.append(Token(T.QIDENT, "".join(buf), i, j + 1))
            i = j + 1
            continue
        # E'...' escape string (host grammar EscapeStringConstant)
        if c in "eE" and i + 1 < n and sql[i + 1] == "'":
            j = i + 2
            buf = []
            while True:
                if j >= n:
                    raise ParserException("unterminated string literal")
                ch = sql[j]
                if ch == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                if ch == "\\" and j + 1 < n:
                    esc = sql[j + 1]
                    simple = {"n": "\n", "t": "\t", "r": "\r", "b": "\b",
                              "f": "\f", "\\": "\\", "'": "'", '"': '"',
                              "0": "\0"}
                    if esc in simple:
                        buf.append(simple[esc])
                        j += 2
                        continue
                    if esc in "xX" and j + 3 < n:
                        hx = sql[j + 2:j + 4]
                        try:
                            buf.append(chr(int(hx, 16)))
                            j += 4
                            continue
                        except ValueError:
                            pass
                    if esc == "u" and j + 5 < n:
                        try:
                            buf.append(chr(int(sql[j + 2:j + 6], 16)))
                            j += 6
                            continue
                        except ValueError:
                            pass
                    buf.append(esc)
                    j += 2
                    continue
                buf.append(ch)
                j += 1
            tokens.append(Token(T.STRING, "".join(buf), i, j + 1))
            i = j + 1
            continue
        # $tag$ ... $tag$ dollar-quoted string (host grammar
        # DollarQuotedString); must not swallow $N parameters
        if c == "$":
            k = i + 1
            while k < n and (sql[k].isalnum() or sql[k] == "_"):
                k += 1
            if k < n and sql[k] == "$" and not sql[i + 1:k].isdigit():
                tag = sql[i:k + 1]
                close = sql.find(tag, k + 1)
                if close < 0:
                    raise ParserException("unterminated string literal")
                tokens.append(Token(T.STRING, sql[k + 1:close], i,
                                    close + len(tag)))
                i = close + len(tag)
                continue
        # hex / binary integer literals (0x1A, 0b101)
        if c == "0" and i + 1 < n and sql[i + 1] in "xXbB":
            digits = "0123456789abcdefABCDEF_" if sql[i + 1] in "xX" \
                else "01_"
            j = i + 2
            while j < n and sql[j] in digits:
                j += 1
            if j > i + 2:
                base = 16 if sql[i + 1] in "xX" else 2
                v = int(sql[i + 2:j].replace("_", ""), base)
                tokens.append(Token(T.NUMBER, str(v), i, j))
                i = j
                continue
        # number (digit, or '.' followed by digit)
        if c.isdigit() or (c == "." and i + 1 < n and sql[i + 1].isdigit()):
            j = i
            seen_dot = False
            seen_exp = False
            while j < n:
                ch = sql[j]
                if ch.isdigit() or ch == "_":
                    j += 1
                elif ch == "." and not seen_dot and not seen_exp:
                    # don't eat '..' or trailing method-call style
                    if j + 1 < n and sql[j + 1] == ".":
                        break
                    seen_dot = True
                    j += 1
                elif ch in "eE" and not seen_exp and j + 1 < n and (
                        sql[j + 1].isdigit() or sql[j + 1] in "+-"):
                    seen_exp = True
                    j += 2 if sql[j + 1] in "+-" else 1
                else:
                    break
            tokens.append(Token(T.NUMBER, sql[i:j].replace("_", ""), i, j))
            i = j
            continue
        # identifier
        if c.isalpha() or c == "_":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] == "_" or sql[j] == "$"):
                j += 1
            tokens.append(Token(T.IDENT, sql[i:j], i, j))
            i = j
            continue
        # operators
        matched = False
        for op in _MULTI_OPS:
            if sql.startswith(op, i):
                tokens.append(Token(T.OP, op, i, i + len(op)))
                i += len(op)
                matched = True
                break
        if matched:
            continue
        if c in _SINGLE_OPS:
            tokens.append(Token(T.OP, c, i, i + 1))
            i += 1
            continue
        raise ParserException(f"unexpected character {c!r} at position {i}")
    tokens.append(Token(T.EOF, "", n, n))
    return tokens
