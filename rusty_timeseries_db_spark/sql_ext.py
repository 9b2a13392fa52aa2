"""SQL surface for the as-of join (SURVEY §2.2 J6).

Spark SQL has no ``ASOF JOIN`` syntax, so REPL/SQL users could only
reach ``operators/asof.py`` through the Python API. ``sql_with_asof``
closes that gap: it accepts the DuckDB-style ``ASOF JOIN`` clause
(public syntax: ``FROM l ASOF JOIN r ON l.k = r.k AND l.ts >= r.ts``),
rewrites that clause into the union+window as-of plan, and hands the
rest of the statement to ``spark.sql`` unchanged — the operator runs
on the same single-shuffle plan as the Python path (parity-tested in
tests/test_asof.py).

Supported grammar (deliberately narrow and documented; anything else
raises ``ValueError`` rather than mis-parsing):

    SELECT ... FROM <ltable> [AS] [lalias]
        ASOF JOIN <rtable> [AS] [ralias]
        ON <eq> [AND <eq>]... AND <ineq>
    [WHERE/GROUP BY/ORDER BY/... rest passes through]

- ``<eq>``: ``lalias.k = ralias.k`` — same column name on both sides
  (the as-of key);
- ``<ineq>``: exactly one of ``lalias.lts >= ralias.rts`` (backward —
  latest right row at or before the left timestamp) or
  ``lalias.lts <= ralias.rts`` (forward);
- both tables must be registered views (``spark.table``-resolvable);
- in the outer query, right-side payload columns are referenced as
  ``<col>_right`` (the operator's suffix convention) — unqualified or
  qualified by the LEFT alias; the right alias does not survive the
  rewrite.
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import DataFrame, SparkSession

from .operators.asof import asof_join

_VIEW_SEQ = itertools.count()

_KEYWORDS = r"WHERE|GROUP|ORDER|HAVING|LIMIT|WINDOW|UNION|INTERSECT|EXCEPT"

_ASOF_RE = re.compile(
    rf"""
    \bFROM\s+
    (?P<lt>[\w.]+)
    (?:\s+(?:AS\s+)?(?!ASOF\b)(?P<la>\w+))?
    \s+ASOF\s+JOIN\s+
    (?P<rt>[\w.]+)
    (?:\s+(?:AS\s+)?(?!ON\b)(?P<ra>\w+))?
    \s+ON\s+
    (?P<cond>.+?)
    (?=\s+(?:{_KEYWORDS})\b|\s*$)
    """,
    re.IGNORECASE | re.DOTALL | re.VERBOSE,
)

_COND_RE = re.compile(
    r"^\s*(\w+)\.(\w+)\s*(>=|<=|=)\s*(\w+)\.(\w+)\s*$", re.DOTALL
)


def sql_with_asof(
    spark: SparkSession, query: str, right_order: str | None = None
) -> DataFrame:
    """Run a SQL statement that may contain one DuckDB-style ``ASOF
    JOIN`` clause (see module docstring for the supported grammar).
    Statements without the clause pass straight to ``spark.sql``.

    ``right_order`` optionally names a right-side column that breaks
    ties among right rows sharing (key, ts) — the SQL clause itself has
    no tie-break syntax.
    """
    m = _ASOF_RE.search(query)
    if m is None:
        if re.search(r"\bASOF\b", query, re.IGNORECASE):
            raise ValueError(
                "ASOF present but not in the supported form "
                "'FROM l [AS a] ASOF JOIN r [AS b] ON ...'"
            )
        return spark.sql(query)

    lt, la = m.group("lt"), m.group("la") or m.group("lt")
    rt, ra = m.group("rt"), m.group("ra") or m.group("rt")
    keys: list[str] = []
    ineq: tuple[str, str, str] | None = None  # (left_ts, right_ts, direction)
    for raw in re.split(r"\bAND\b", m.group("cond"), flags=re.IGNORECASE):
        cm = _COND_RE.match(raw)
        if cm is None:
            raise ValueError(f"unsupported ASOF ON condition: {raw.strip()!r}")
        q1, c1, op, q2, c2 = cm.groups()
        sides = {q1, q2}
        if sides != {la, ra} or (la == ra):
            raise ValueError(
                f"ASOF ON condition must relate {la!r} to {ra!r}: {raw.strip()!r}"
            )
        if op == "=":
            if c1 != c2:
                raise ValueError(
                    "ASOF equality keys must share a column name "
                    f"(got {q1}.{c1} = {q2}.{c2})"
                )
            keys.append(c1)
        else:
            if ineq is not None:
                raise ValueError("ASOF JOIN needs exactly one inequality")
            # normalize so the left table is on the left of the operator
            if q1 == la:
                lts, rts, lop = c1, c2, op
            else:
                lts, rts, lop = c2, c1, (">=" if op == "<=" else "<=")
            ineq = (lts, rts, "backward" if lop == ">=" else "forward")
    if ineq is None:
        raise ValueError("ASOF JOIN needs one timestamp inequality")
    if not keys:
        raise ValueError("ASOF JOIN needs at least one equality key")

    left_ts, right_ts, direction = ineq
    joined = asof_join(
        spark.table(lt),
        spark.table(rt),
        on=keys,
        left_ts=left_ts,
        right_ts=right_ts,
        right_order=right_order,
        direction=direction,
    )
    view = f"_asof_sql_{next(_VIEW_SEQ)}"
    joined.createOrReplaceTempView(view)
    alias = f" AS {m.group('la')}" if m.group("la") else ""
    rewritten = (
        query[: m.start()] + f"FROM {view}{alias}" + query[m.end("cond"):]
    )
    return spark.sql(rewritten)
