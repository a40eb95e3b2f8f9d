"""ANSI-arithmetic audit gate — pins the round-2 failure class at zero.

Both round-2 bugs (degree_assortativity DIVIDE_BY_ZERO on a regular graph,
revenue_changepoint ARITHMETIC_OVERFLOW at sf0.1) were unguarded arithmetic
under `spark.sql.ansi.enabled` that only degenerate or 10x-scaled data
exposes. tools/ansi_audit.py statically scans every plan for the two
shapes (unguarded column division, bigint sums of column products); each
site must either be fixed (try_divide / decimal widening) or carry an
inline `# ansi: <proof>` annotation. This test keeps the unannotated
count at zero so new plans can't silently reintroduce the class.
"""

from __future__ import annotations

import os

from tools.ansi_audit import PKG, audit_file


def test_no_unannotated_ansi_risk_sites():
    hits = []
    for dirpath, _dirs, files in os.walk(PKG):
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(dirpath, name)
            for lineno, kind, code in audit_file(path):
                hits.append(f"{path}:{lineno}: {kind}: {code}")
    assert not hits, "\n".join(hits)
