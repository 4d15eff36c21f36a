"""linkgraph — a from-scratch PySpark-native link-graph analytics engine.

Capabilities graft of the reference ``sr-murthy/ccm`` (read-only at
/root/reference): ingest pages -> tokenize/classify -> edge table ->
whole-graph analytics -> per-object scores (SURVEY.md). The reference's
pipeline shape (code object -> instruction records -> control-flow edges ->
component/complexity aggregates, /root/reference/src/ccm/graphs.py:46-98,
complexity.py:34-207) is re-expressed here as: Common-Crawl-style pages ->
vectorized link extraction -> edge table -> PageRank / connected components /
label propagation / triangles -> per-component structural complexity.

Everything is idiomatic Spark DataFrame/SQL; the only Python-side compute is
Arrow-vectorized pandas UDFs (extraction, CSR compaction).
"""

__version__ = "0.1.0"
