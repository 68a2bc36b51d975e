"""Interactive SQL/PGQ shell: ``python -m duckpgq_tpu [database.db]``.

The reference is used through the DuckDB shell; this is the standalone
equivalent. Statements end with ';' (multi-line input supported).
Dot-commands: .help .tables .graphs .timer on|off .exit
"""

from __future__ import annotations

import sys
import time


def _format_table(names, rows, max_width: int = 40) -> str:
    def clip(s):
        s = "NULL" if s is None else str(s)
        return s if len(s) <= max_width else s[:max_width - 1] + "…"

    cells = [[clip(v) for v in row] for row in rows]
    widths = [len(n) for n in names]
    for row in cells:
        for i, c in enumerate(row):
            widths[i] = max(widths[i], len(c))
    sep = "─" * (sum(widths) + 3 * len(widths) + 1)
    out = [sep, "│ " + " │ ".join(n.ljust(w) for n, w in zip(names, widths))
           + " │", sep]
    for row in cells:
        out.append("│ " + " │ ".join(c.ljust(w) for c, w in
                                     zip(row, widths)) + " │")
    out.append(sep)
    return "\n".join(out)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    import duckpgq_tpu

    path = argv[0] if argv else None
    con = duckpgq_tpu.connect(path) if path else duckpgq_tpu.connect()
    print(f"duckpgq_tpu shell — {'database: ' + path if path else 'in-memory'}"
          "\nEnter SQL ending with ';'  —  .help for commands")
    timer = False
    buf: list = []
    interactive = sys.stdin.isatty()
    while True:
        try:
            prompt = ("D " if not buf else "· ") if interactive else ""
            line = input(prompt)
        except EOFError:
            break
        except KeyboardInterrupt:
            buf.clear()
            print()
            continue
        if not buf and line.strip().startswith("."):
            cmd = line.strip().split()
            if cmd[0] in (".exit", ".quit"):
                break
            elif cmd[0] == ".help":
                print(".tables  list tables\n.graphs  list property graphs"
                      "\n.timer on|off  toggle timing\n.exit")
            elif cmd[0] == ".tables":
                for r in con.execute(
                        "SELECT table_name FROM duckdb_tables()"
                ).fetchall():
                    print(r[0])
            elif cmd[0] == ".graphs":
                try:
                    for r in con.execute(
                            "PRAGMA show_property_graphs").fetchall():
                        print(r[0])
                except Exception as exc:  # noqa: BLE001
                    print(exc)
            elif cmd[0] == ".timer":
                timer = len(cmd) > 1 and cmd[1] == "on"
            else:
                print(f"unknown command {cmd[0]} (.help)")
            continue
        buf.append(line)
        text = "\n".join(buf)
        if not text.rstrip().endswith(";"):
            continue
        buf.clear()
        for stmt in _split_statements(text):
            t0 = time.time()
            try:
                res = con.execute(stmt)
            except Exception as exc:  # noqa: BLE001 — REPL surfaces errors
                print(f"Error: {exc}")
                continue
            if res.names:
                rows = res.fetchall()
                print(_format_table(res.names, rows))
                print(f"({len(rows)} row{'s' if len(rows) != 1 else ''})")
            if timer:
                print(f"Run Time: {time.time() - t0:.3f}s")
    con.close()
    return 0


def _split_statements(text: str):
    """Split on ';' outside quotes (the engine takes one statement per
    execute)."""
    out, cur, quote = [], [], None
    for ch in text:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            cur.append(ch)
        elif ch == ";":
            stmt = "".join(cur).strip()
            if stmt:
                out.append(stmt)
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


if __name__ == "__main__":
    sys.exit(main())
