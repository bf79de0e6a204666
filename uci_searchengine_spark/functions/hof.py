"""Shared lambda-binding helper for scan-side HOF expressions.

``bind_once(col, body)`` evaluates ``col`` once per row and hands it to
``body`` as a LAMBDA-BOUND variable. Expressions that probe a derived
array element-by-element (``F.get``/``F.slice`` inside HOF lambdas) or
reference it several times are otherwise subject to CollapseProject
inlining the derived expression into every reference — interpreted HOF
eval then recomputes it once per probe (measured: span_not re-tokenized
each document ~50x, 2.5 s vs 0.25 s over 5k docs). Lambda variables are
evaluated once by construction and can never be inlined into (the
``winnow_fingerprints`` precedent, shared by functions/phrase.py and
functions/textstats.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(col: Column, body) -> Column:
    return F.element_at(F.transform(F.array(col), body), 1)
