"""Driver-local model tables as SQL VALUES (LocalRelation).

``spark.createDataFrame(rows, schema)`` on a plain Python list always
routes through an RDD of pickled rows: the data becomes
defaultParallelism RDD partitions and every consumption launches that
many PYTHON WORKER tasks — measured 32 tasks / up to ~1.7 s of cold
worker spawn per tiny codebook table in the embedding lanes
(optimization r14, second segment). Rendering the same rows as a SQL
``VALUES`` literal builds a LocalRelation instead: zero jobs, zero
Python workers, and broadcast exchanges read the rows directly.

Only bounded MODEL state belongs here (centroid codebooks, projection
tables, id lists — the k×d collect()-scale frames the operators
already hold on the driver); anything data-sized keeps createDataFrame.
Values render exactly: ints as integer literals, floats through
``repr`` round-trip (cast from string — a bare SQL ``0.1`` parses as
DECIMAL), arrays recursively. Unsupported value/type shapes raise so
the caller can fall back deliberately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_INT_TYPES = {"tinyint", "smallint", "int", "integer", "bigint", "long"}


def _split_schema(schema: str) -> list[tuple[str, str]]:
    """Split a DDL string into (name, type) pairs at top-level commas."""
    parts, depth, cur = [], 0, []
    for ch in schema:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    out = []
    for p in parts:
        p = p.strip()
        name, typ = p.split(None, 1)
        out.append((name, typ.strip().lower()))
    return out


def _render(v, typ: str) -> str:
    if v is None:
        return f"cast(null as {typ})"
    if typ.startswith("array<") and typ.endswith(">"):
        inner = typ[6:-1].strip()
        if not len(v):
            # a bare `array()` types as array<string>; in a VALUES list
            # whose other rows (or declared schema) are array<bigint>/
            # array<double>, analysis would fail OUTSIDE the caller's
            # try block (spark.sql), defeating the documented
            # createDataFrame fallback — make the element type explicit
            # (ADVICE r14)
            return f"cast(array() as {typ})"
        return "array(" + ", ".join(_render(x, inner) for x in v) + ")"
    if typ in ("double", "float"):
        import math

        f = float(v)
        if not math.isfinite(f):
            # 'inf'/'nan' SQL-cast behavior is locale-ish ('inf' casts
            # to NULL); refuse so the caller falls back to
            # createDataFrame, which ships the IEEE value faithfully
            raise ValueError("values_table cannot render non-finite floats")
        return f"cast('{f!r}' as {typ})"
    if typ in _INT_TYPES:
        return f"cast({int(v)} as {typ})"
    if typ == "boolean":
        return "true" if bool(v) else "false"
    raise ValueError(f"values_table cannot render type {typ!r}")


def values_table(spark: SparkSession, rows, schema: str) -> DataFrame:
    """A DataFrame over ``rows`` built as a SQL VALUES LocalRelation.

    ``rows`` is a list of tuples (or scalars for one-column schemas);
    ``schema`` is the same DDL string createDataFrame takes. Falls back
    to ``createDataFrame`` for empty input (VALUES needs >= 1 row) or
    value/type shapes the renderer does not support.
    """
    cols = _split_schema(schema)
    rows = list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema)
    try:
        rendered = []
        for r in rows:
            if not isinstance(r, (tuple, list)):
                r = (r,)
            if len(r) != len(cols):
                raise ValueError("row width != schema width")
            rendered.append(
                "(" + ", ".join(_render(v, t) for v, (_, t) in zip(r, cols)) + ")"
            )
    except (ValueError, TypeError):
        return spark.createDataFrame(rows, schema)
    names = ", ".join(n for n, _ in cols)
    return spark.sql(f"SELECT * FROM (VALUES {', '.join(rendered)}) AS t({names})")
