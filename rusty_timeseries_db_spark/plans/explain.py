"""Plan-inspection helpers: assert that the physical plan has the shape
we designed for (pushdown reached the scan, joins broadcast, codegen
spans exist). Used by tests and the bench harness — "measure, don't
guess".
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def scan_read_schema(df: DataFrame) -> str:
    """The ReadSchema of the first parquet scan — verifies column
    pruning (a scan reading all columns for a 2-column projection is a
    bug)."""
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            return line.removeprefix("ReadSchema:").strip()
    return ""


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")
