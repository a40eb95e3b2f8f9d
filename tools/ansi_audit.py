"""ANSI-arithmetic static audit — guards the round-2 failure class.

Both round-2 bugs were one family: arithmetic that is fine at the scale it
was verified at and explodes under `spark.sql.ansi.enabled` when the data
grows or degenerates:

  * DIVIDE_BY_ZERO — ANSI throws for division by zero even on DOUBLE
    operands (degree_assortativity on a regular graph, sf0.01);
  * ARITHMETIC_OVERFLOW — BIGINT sums of products cross int64 under
    `addExact` at 10x the verified scale (revenue_changepoint at sf0.1).

This tool scans the package source for both shapes:

  1. `F.sum(...)` / window sums whose argument multiplies columns without
     first widening to decimal/double — the overflow class;
  2. `/` whose right-hand side is a column expression (not a literal or a
     guaranteed-positive group count) outside `F.try_divide` — the
     divide-by-zero class.

A site that is genuinely safe carries an inline annotation on the same or
the preceding line:

    # ansi: <why this cannot overflow / divide by zero>

and is then skipped. Unannotated hits are printed and exit code is 1 —
tests/test_ansi_audit.py keeps the list pinned at zero.

    python tools/ansi_audit.py
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "pdf_parse_vector_db_spark")

#: denominators that cannot be zero where they appear:
#:  - F.count(F.lit(1)) in a groupBy().agg() is >= 1 for every emitted group
#:  - F.lit(<nonzero literal>) and bare numeric literals
_SAFE_DEN = re.compile(
    r"^\s*(?:"
    r"F\.count\(F\.lit\(1\)\)"
    r"|F\.lit\(\s*-?\d+(?:\.\d+)?(?:e-?\d+)?\s*\)"
    r"|F\.lit\(_[A-Z][A-Z_0-9]*\)"  # F.lit(_MODULE_CONSTANT), nonzero by convention
    r"|F\.lit\(float\("
    r"|F\.lit\($"  # literal continued on the next source line
    r"|-?\d+(?:\.\d+)?(?:[eE]-?\d+)?"
    r"|_[A-Z_]+"  # module-level nonzero constant (naming convention)
    r"|float\([A-Za-z_]"  # float(_CONST) / float(len(...)) wrappers
    r"|len\("
    r")"
)

_DIV = re.compile(r"(?<!/)/(?!/|=|\*)")
_SUM_OPEN = re.compile(r"F\.sum\(")


def _sum_products(src: str) -> list[int]:
    """Balanced-paren scan: line numbers of F.sum(...) calls whose argument
    multiplies subexpressions without widening to decimal/double first."""
    out = []
    for m in _SUM_OPEN.finditer(src):
        depth, i = 1, m.end()
        while i < len(src) and depth:
            if src[i] == "(":
                depth += 1
            elif src[i] == ")":
                depth -= 1
            i += 1
        arg = src[m.end() : i - 1]
        # the overflow class is an integer-column x integer-column product;
        # a product with a pure numeric literal (fixed-point cents/micros
        # scaling) grows the summand by a constant, which the per-group sum
        # bound covers (int64 holds $92e15 in cents), and anything widened
        # to decimal/double before the sum is already safe
        if (
            "*" in arg
            and "decimal" not in arg
            and '"double"' not in arg
            and arg.count("F.col(") + arg.count("F.expr(") >= 2
        ):
            out.append(src.count("\n", 0, m.start()) + 1)
    return out


def _annotated(lines: list[str], idx: int) -> bool:
    for j in (idx, idx - 1):
        if 0 <= j < len(lines) and "# ansi:" in lines[j]:
            return True
    return False


def _in_string_or_comment(line: str, pos: int) -> bool:
    """Crude but effective: skip `/` inside '...'/"..." literals (SQL text,
    format strings) and after a comment marker."""
    prefix = line[:pos]
    if "#" in prefix:
        return True
    return prefix.count('"') % 2 == 1 or prefix.count("'") % 2 == 1


def audit_file(path: str) -> list[tuple[int, str, str]]:
    with open(path, encoding="utf-8") as fh:
        src = fh.read()
    # strip triple-quoted strings (docstrings + embedded oracle SQL): the
    # oracle side runs on DuckDB where ANSI-mode Spark semantics don't apply
    stripped = re.sub(r'("""|\'\'\')(?:.|\n)*?\1', lambda m: "\n" * m.group(0).count("\n"), src)
    lines = stripped.splitlines()
    hits: list[tuple[int, str, str]] = []
    sum_lines = set(_sum_products(stripped))
    for i, line in enumerate(lines):
        if _annotated(lines, i):
            continue
        if i + 1 in sum_lines:
            hits.append((i + 1, "sum-of-product (bigint overflow risk)", line.strip()))
            continue
        if "try_divide" in line:
            continue
        for m in _DIV.finditer(line):
            if _in_string_or_comment(line, m.start()):
                continue
            rhs = line[m.end() :].lstrip()
            if not rhs:
                # denominator continues on the next line — conservative flag
                nxt = lines[i + 1].strip() if i + 1 < len(lines) else ""
                rhs = nxt
            if _SAFE_DEN.match(rhs):
                continue
            hits.append((i + 1, "unguarded division (ANSI divide-by-zero risk)", line.strip()))
            break
    return hits


def main() -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(PKG):
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(dirpath, name)
            for lineno, kind, code in audit_file(path):
                rel = os.path.relpath(path, ROOT)
                print(f"{rel}:{lineno}: {kind}\n    {code}")
                total += 1
    print(f"{total} unannotated ANSI-arithmetic risk site(s)")
    return 1 if total else 0


if __name__ == "__main__":
    sys.exit(main())
