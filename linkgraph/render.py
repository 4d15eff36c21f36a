"""Formatting sinks — fixed-width rows, bitmask projection, debug strings.

≙ reference capabilities:
- P3 fixed-width row formatter: ``xdis``-style instruction line rendering
  (/root/reference/src/ccm/xdis.py:79-122 pads offset/opname/arg columns).
- P6 bitmask -> names projection: compiler-flag decoding
  (/root/reference/src/ccm/xdis.py:30-46 maps set bits to flag names).
- S6/S8 display sinks: the ``dis``-family string renderers
  (xdis.py:79-122; README.rst's printed tables).

All column-level work is JVM expressions; the only driver-side step is the
explicitly-bounded ``to_debug_string`` (a *display* sink — it limits before
collecting, so it is never a distributed-compute path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def fixed_width_row(
    df: DataFrame,
    specs: list[tuple[str, int]],
    out_col: str = "line",
    sep: str = " ",
) -> DataFrame:
    """Append ``out_col``: each (col, width) rendered right-padded (strings)
    or left-padded (numerics) to width, joined by ``sep``."""
    parts = []
    for col, width in specs:
        c = F.col(col)
        is_num = dict(df.dtypes).get(col, "string") not in ("string",)
        padded = (
            F.lpad(c.cast("string"), width, " ")
            if is_num
            else F.rpad(c.cast("string"), width, " ")
        )
        parts.append(padded)
    return df.withColumn(out_col, F.concat_ws(sep, *parts))


def bitmask_names(mask_col, names: list[str]):
    """Column expr: array of ``names[i]`` for every set bit i of mask_col
    (the reference's flag decoding, xdis.py:30-46)."""
    return F.filter(
        F.array(
            *[
                F.when(mask_col.bitwiseAND(F.lit(1 << i)) != 0, F.lit(nm))
                for i, nm in enumerate(names)
            ]
        ),
        lambda x: x.isNotNull(),
    )


def debug_lines(
    df: DataFrame, n: int, order_by: list[str], sep: str = " | "
) -> DataFrame:
    """S8 as a DATAFLOW sink: the bounded debug render, deterministic and
    distributed — top-``n`` rows under an explicit total order, each
    rendered as one fixed-width line whose column widths are the max
    display width over the bounded subset (the same auto-layout rule as
    ``to_debug_string``, but the result is (line_no, line) rows, never a
    driver-side string). The limit happens BEFORE the width aggregation,
    so the whole sink touches n rows regardless of input size."""
    cols = df.columns
    dtypes = dict(df.dtypes)
    w = Window.orderBy(*order_by)
    top = (
        df.withColumn("line_no", F.row_number().over(w))
        .where(F.col("line_no") <= n)
    )
    widths = top.agg(
        *[
            F.greatest(
                F.lit(len(c)), F.max(F.length(F.col(c).cast("string")))
            ).alias(f"w_{c}")
            for c in cols
        ]
    )
    parts = []
    for c in cols:
        fn = "lpad" if dtypes.get(c, "string") != "string" else "rpad"
        parts.append(F.expr(f"{fn}(cast(`{c}` as string), w_{c}, ' ')"))
    return (
        top.crossJoin(F.broadcast(widths))
        .select(
            F.col("line_no").cast("int").alias("line_no"),
            F.concat_ws(sep, *parts).alias("line"),
        )
    )


def to_debug_string(df: DataFrame, n: int = 20, order_by: list[str] | None = None) -> str:
    """Bounded string-render sink (S8): deterministic first-n rows as a
    fixed-width text table. Limits BEFORE collecting."""
    cols = df.columns
    if order_by:
        df = df.orderBy(*order_by)
    rows = df.limit(n).collect()
    widths = {
        c: max(len(c), *(len(str(r[c])) for r in rows)) if rows else len(c)
        for c in cols
    }
    header = " | ".join(c.ljust(widths[c]) for c in cols)
    sepline = "-+-".join("-" * widths[c] for c in cols)
    body = [
        " | ".join(str(r[c]).ljust(widths[c]) for c in cols) for r in rows
    ]
    return "\n".join([header, sepline, *body])


def dot_lines(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = True,
    out_col: str = "dot",
) -> DataFrame:
    """One DOT edge statement per row: ``  "src" -> "dst";``.

    ≙ S9 ``draw_graph`` (/root/reference/src/ccm/drawing.py:20-65) as a
    *text* sink: the engine renders the graph to DOT source distributed
    (pure JVM string expressions), and any graphviz ships it to pixels
    off-cluster — the scale-sane split of the reference's matplotlib
    figure sink. Pair with ``to_dot`` for a bounded whole-document render.
    """
    arrow = "->" if directed else "--"
    return edges.select(
        F.concat(
            F.lit('  "'),
            F.col(src_col).cast("string"),
            F.lit(f'" {arrow} "'),
            F.col(dst_col).cast("string"),
            F.lit('";'),
        ).alias(out_col)
    )


def to_dot(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = True,
    name: str = "g",
    max_edges: int = 10_000,
) -> str:
    """Bounded whole-document DOT render (display sink: limits BEFORE
    collecting, like to_debug_string — never a distributed-compute path)."""
    lines = [
        r[0]
        for r in dot_lines(edges, src_col, dst_col, directed)
        .limit(max_edges)
        .collect()
    ]
    head = "digraph" if directed else "graph"
    return f"{head} {name} {{\n" + "\n".join(sorted(lines)) + "\n}\n"
