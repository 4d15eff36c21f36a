"""SQL catalog: temp views plan like the DataFrame calls."""

import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_register_views_and_sql(spark):
    from linkgraph.catalog import register

    names = register(spark, SF)
    assert set(names) >= {"lg_documents", "lg_edges", "lg_vertices", "lg_links"}
    nd = spark.sql("SELECT count(*) AS c FROM lg_documents").collect()[0]["c"]
    assert nd > 0
    # the graph layer joins up through SQL: every edge endpoint resolves
    bad = spark.sql("""
        SELECT count(*) AS c FROM lg_edges e
        LEFT ANTI JOIN lg_vertices v ON e.src = v.id
    """).collect()[0]["c"]
    assert bad == 0
    # filters push through the view to the parquet scan
    plan = spark.sql(
        "SELECT doc_id FROM lg_documents WHERE lang = 'en'"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
