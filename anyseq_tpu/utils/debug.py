"""DP-state introspection: pretty-print H/E/F and predecessor matrices.

Analog of the reference's debug printers (src/utils.impala:51-152 --
print_matrix / print_matrix_s / print_sequence), which exist there for
manual inspection and are never called in committed code. Here they are
wired into test failure messages so a kernel/engine miscompare shows the
full DP state for tiny inputs instead of a bare array diff.

All matrices come from the numpy oracles (ref/oracle.py dp_full,
ref/oracle_affine.py dp_full_affine) and carry the -1 boundary row/column
at index 0.
"""
from __future__ import annotations

import io
import sys

import numpy as np

from anyseq_tpu.core.types import (
    AffineScoring,
    LinearScoring,
    Mode,
    as_u8,
)

_PRED_CHAR = {0: ".", 1: "<", 2: "^", 3: "\\"}  # NONE/GAP_Q/GAP_S/NO_GAP


def format_matrix(M, q8, s8, title="H", neg_inf_below=-(2**28)) -> str:
    """One (m+1, n+1) boundary-haloed matrix as an aligned text table.

    Column header is the subject, row header the query; the 0 row/column
    (the -1 boundary) is labeled '*'. Values below ``neg_inf_below``
    print as '-inf'."""
    m1, n1 = M.shape
    cells = []
    for row in np.asarray(M):
        cells.append(
            ["-inf" if v < neg_inf_below else str(int(v)) for v in row]
        )
    w = max(4, max(len(c) for row in cells for c in row))
    head = ["*"] + [chr(c) if 32 <= c < 127 else str(c) for c in s8[: n1 - 1]]
    qhead = ["*"] + [chr(c) if 32 <= c < 127 else str(c) for c in q8[: m1 - 1]]
    out = [f"{title}:"]
    out.append(" " * 2 + "".join(h.rjust(w + 1) for h in head))
    for i, row in enumerate(cells):
        out.append(qhead[i].rjust(2) + "".join(c.rjust(w + 1) for c in row))
    return "\n".join(out)


def format_preds(P, q8, s8, title="preds") -> str:
    """Predecessor matrix as direction glyphs: '\\\\'=diag, '<'=gap_q
    (left), '^'=gap_s (up), '.'=none."""
    m1, n1 = P.shape
    head = ["*"] + [chr(c) if 32 <= c < 127 else str(c) for c in s8[: n1 - 1]]
    qhead = ["*"] + [chr(c) if 32 <= c < 127 else str(c) for c in q8[: m1 - 1]]
    out = [f"{title}:"]
    out.append("   " + " ".join(h.rjust(1) for h in head))
    for i, row in enumerate(np.asarray(P)):
        out.append(
            qhead[i].rjust(2) + " "
            + " ".join(_PRED_CHAR.get(int(v) & 3, "?") for v in row)
        )
    return "\n".join(out)


def format_dp_state(query, subject, mode="global",
                    scoring=LinearScoring()) -> str:
    """Full DP state of a tiny problem as a string: H (+ E/F for affine)
    and the predecessor matrix, computed by the numpy oracle."""
    q8 = as_u8(query)
    s8 = as_u8(subject)
    mode = Mode.parse(mode)
    buf = io.StringIO()
    print(f"mode={mode.name} m={len(q8)} n={len(s8)} scoring={scoring}",
          file=buf)
    if isinstance(scoring, AffineScoring):
        from anyseq_tpu.ref.oracle_affine import dp_full_affine

        H, E, F, PH, PE, PF = dp_full_affine(q8, s8, mode, scoring)
        print(format_matrix(H, q8, s8, "H"), file=buf)
        print(format_matrix(E, q8, s8, "E (gap in query / horizontal)"),
              file=buf)
        print(format_matrix(F, q8, s8, "F (gap in subject / vertical)"),
              file=buf)
        print(format_preds(PH, q8, s8, "preds (H choice)"), file=buf)
    else:
        from anyseq_tpu.ref.oracle import dp_full

        H, P = dp_full(q8, s8, mode, scoring)
        print(format_matrix(H, q8, s8, "H"), file=buf)
        print(format_preds(P, q8, s8), file=buf)
    return buf.getvalue()


def dump_matrix(query, subject, mode="global", scoring=LinearScoring(),
                file=None):
    """Print the full DP state of a tiny problem (reference
    utils.impala:51-152 analog). For debugging engine/kernel miscompares:
    keep inputs small (the oracle is O(m*n) Python)."""
    print(format_dp_state(query, subject, mode, scoring),
          file=file or sys.stdout)
