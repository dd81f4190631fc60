"""Linear-memory (Hirschberg-style) traceback engine (placeholder).

Will mirror the reference lintime machinery (align.impala:237-311,
traceback_lintime.impala) as batched forward/reverse half sweeps with an
argmax merge; see SURVEY.md §7 step 5.
"""
from __future__ import annotations


def align_hirschberg(query, subject, mode, scoring, engine="auto"):
    raise NotImplementedError("hirschberg engine not yet implemented")
