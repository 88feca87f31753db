"""Physical-plan inspection helpers.

The engine leans on Catalyst for pushdown/pruning/codegen (SURVEY.md
§4); these helpers make those properties ASSERTABLE in tests and
visible in tuning sessions, instead of hoped-for. Example:

    assert plan_has(df, "PushedFilters")
    assert plan_has(df, "WholeStageCodegen")
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_summary(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (captures ``df.explain``)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def plan_has(df: DataFrame, fragment: str, mode: str = "formatted") -> bool:
    """True if the explained plan contains ``fragment``."""
    return fragment in explain_summary(df, mode)
