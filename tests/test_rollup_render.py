"""Nested rollup (A5) + formatting sinks (P3/P6/S8) unit tests."""

from pyspark.sql import functions as F

from linkgraph.render import bitmask_names, fixed_width_row, to_debug_string
from linkgraph.rollup import members_digest, nested_members, top_members


def _df(spark):
    rows = [(1, 10, "a"), (1, 5, "b"), (2, 7, "c"), (1, 8, "d")]
    return spark.createDataFrame(rows, "key int, id int, name string")


def test_nested_members_sorted(spark):
    out = nested_members(_df(spark), "key", ("id", "name"))
    got = {r["key"]: (r["n_members"], [tuple(m) for m in r["members"]])
           for r in out.collect()}
    assert got == {
        1: (3, [(5, "b"), (8, "d"), (10, "a")]),
        2: (1, [(7, "c")]),
    }


def test_top_members_caps_group(spark):
    out = top_members(_df(spark), "key", order="id", k=2, member_cols=("id",))
    got = {r["key"]: [m["id"] for m in r["members"]] for r in out.collect()}
    assert got == {1: [5, 8], 2: [7]}


def test_members_digest(spark):
    nested = nested_members(_df(spark), "key", ("id", "name"))
    got = {r["key"]: r["members_str"] for r in members_digest(nested, ("id", "name")).collect()}
    assert got == {1: "5/b,8/d,10/a", 2: "7/c"}


def test_fixed_width_row(spark):
    df = spark.createDataFrame([(7, "abc")], "k int, s string")
    out = fixed_width_row(df, [("k", 4), ("s", 6)]).collect()[0]["line"]
    assert out == "   7 abc   "


def test_bitmask_names(spark):
    names = ["A", "B", "C", "D"]
    df = spark.createDataFrame([(0,), (1,), (5,), (15,)], "m int")
    got = [
        r[0]
        for r in df.select(
            F.concat_ws("|", bitmask_names(F.col("m"), names))
        ).collect()
    ]
    assert got == ["", "A", "A|C", "A|B|C|D"]


def test_to_debug_string(spark):
    df = spark.createDataFrame([(2, "y"), (1, "x")], "k int, v string")
    s = to_debug_string(df, n=10, order_by=["k"])
    lines = s.splitlines()
    assert lines[0].split("|")[0].strip() == "k"
    assert "1" in lines[2] and "x" in lines[2]
    assert "2" in lines[3] and "y" in lines[3]


def test_dot_lines_and_document(spark):
    from linkgraph.render import dot_lines, to_dot

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], ["src", "dst"]
    )
    lines = {r["dot"] for r in dot_lines(edges).collect()}
    assert lines == {
        '  "a" -> "b";', '  "b" -> "c";', '  "a" -> "c";'
    }
    doc = to_dot(edges, name="t")
    assert doc.startswith("digraph t {\n")
    assert doc.endswith("}\n")
    assert doc.count(";") == 3
    undoc = to_dot(edges, directed=False)
    assert '"a" -- "b";' in undoc and undoc.startswith("graph g {")


def test_debug_lines_bounded_deterministic(spark):
    """S8 dataflow sink: top-n under the explicit order, widths from the
    bounded subset, numerics left-padded / strings right-padded."""
    from linkgraph.render import debug_lines

    df = spark.createDataFrame(
        [(3, "ccc"), (1, "a"), (2, "bbbbbbb"), (10, "d")],
        "k long, name string",
    )
    out = {r["line_no"]: r["line"] for r in debug_lines(df, 3, ["k"]).collect()}
    assert set(out) == {1, 2, 3}
    # widths from subset {1,2,3}: k width = len("k")=1, name width = 7
    assert out[1] == "1 | a      "
    assert out[2] == "2 | bbbbbbb"
    assert out[3] == "3 | ccc    "
