"""Shared column-expression helpers.

Everything here is built-in-function composition (JVM-side, whole-stage
codegen) — no Python UDFs. Where an oracle needs the identical computation in
duckdb SQL, the paired ``*_SQL`` template is defined next to the Spark
expression so the two stay in lock-step (floating-point results must match
bit-for-bit after rounding, so map/fold order is mirrored deliberately).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import col, lit


# --- tokenization ----------------------------------------------------------

def tokens(text: Column | str) -> Column:
    """Whitespace tokens with empties dropped.

    duckdb mirror: list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')
    """
    c = col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def tokens_sql(expr: str = "text") -> str:
    return f"list_filter(regexp_split_to_array({expr}, '\\s+'), t -> t <> '')"


# --- portable 48-bit hash --------------------------------------------------
# Both engines md5 identically; the first 12 hex chars give 48 bits, which
# leaves headroom for (a * h + b) to stay inside int64.

def hash48(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("long")


def hash48_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 12) AS BIGINT)"


# --- vector math (array<double>) ------------------------------------------
# Sequential left fold on both engines: Spark F.aggregate == duckdb
# list_reduce (fp-identical because (0.0 + x1) == x1 exactly).

def as_double_array(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def as_double_array_sql(expr: str) -> str:
    return f"list_transform({expr}, x -> CAST(x AS DOUBLE))"


def matrix_literal(rows: list[list[float]]) -> Column:
    """``array<array<double>>`` literal parsed from ONE expression string.

    Building the same matrix element-wise (``F.array(*[F.array(*[lit(x)
    ...])])``) issues one py4j round trip per element — ~2 s of driver time
    for a 16×64 centroid matrix, measured — while a single ``F.expr`` parse
    is milliseconds. The resulting plan (and therefore the result) is
    identical; repr round-trips doubles exactly and the ``D`` suffix keeps
    Spark SQL from reading decimals as DECIMAL.
    """
    body = ", ".join(
        "array(" + ", ".join(f"{x!r}D" for x in row) + ")" for row in rows
    )
    return F.expr(f"array({body})")


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, 1 + len({a})),"
        f" i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


def sq_l2(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)))


def sq_l2_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, 1 + len({a})),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def cosine_sql(a: str, b: str) -> str:
    return f"{dot_sql(a, b)} / sqrt({dot_sql(a, a)} * {dot_sql(b, b)})"


def materialize_ctes(sql: str) -> str:
    """Pin evaluate-once semantics for every CTE in a duckdb oracle.

    duckdb inlines a CTE at EVERY reference site by default, so an oracle
    whose banded/recursive tail references a heavy CTE k times re-runs
    the whole upstream pipeline k times — measured 17 s -> 0.36 s on the
    q58 oracle at sf0.1 (results bit-identical; the 100x inflation was
    pure re-evaluation). Applied to duckdb-dialect oracles only: the
    MATERIALIZED keyword does not parse in Spark SQL, so portable oracles
    (tests/test_sql_passthrough.PORTABLE) must not go through this.

    The rewrite is anchored to CTE-list position: only ``name AS (`` /
    ``name(cols) AS (`` definitions reached from the top-level WITH list
    (depth-0, comma-separated) are touched. A blind global substitution
    would also rewrite named ``WINDOW w AS (...)`` clauses in the main
    query, which duckdb rejects as a parse error. Single-quoted string
    literals (with '' escapes) are skipped when balancing parens so a
    regexp constant containing ``(`` inside a CTE body cannot desync the
    walk.

    Anchor: the LEADING ``WITH`` only (every oracle that has CTEs starts
    with its WITH list). A ``re.search`` for the first ``\\bWITH\\b``
    anywhere would start the CTE walk at the wrong offset if a leading
    comment or string literal contained the word — the round-8 ADVICE
    latent-bug class; ``re.match`` over leading whitespace cannot."""
    import re

    m = re.match(r"\s*WITH\s+(?:RECURSIVE\s+)?", sql, re.IGNORECASE)
    if m is None:
        return sql
    out = [sql[: m.end()]]
    i = m.end()
    n = len(sql)
    head_re = re.compile(r"(\w+)(\s*\([^()]*\))?(\s+AS\s+)\(", re.IGNORECASE)
    sep_re = re.compile(r"\s*,\s*")
    while True:
        mm = head_re.match(sql, i)
        if mm is None:  # malformed WITH list — leave the remainder as-is
            break
        out.append(mm.group(1) + (mm.group(2) or "") + mm.group(3) + "MATERIALIZED (")
        i = mm.end()
        depth = 1
        body_start = i
        while i < n and depth:
            ch = sql[i]
            if ch == "'":  # skip string literal ('' is the escape)
                i += 1
                while i < n:
                    if sql[i] == "'":
                        if i + 1 < n and sql[i + 1] == "'":
                            i += 2
                            continue
                        break
                    i += 1
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        out.append(sql[body_start:i])
        ms = sep_re.match(sql, i)
        if ms is None:  # main query begins — stop rewriting
            break
        out.append(sql[i : ms.end()])
        i = ms.end()
    out.append(sql[i:])
    return "".join(out)
