"""PySpark-native knowledge-graph construction engine.

A from-scratch rebuild (NOT a port) of the capabilities of the reference
pipeline ``shanefeng123/coap_rfc_knowledge_graph``: triple extraction,
entity linking, canonicalization and graph materialization over
Common-Crawl-style web-page tables, expressed Spark-first (DataFrame /
Catalyst / pandas-Arrow UDFs), designed for 10^12-document scale with
explicit url hash-partitioning, broadcast + salted joins for skew, and
per-partition checkpoint/lineage manifests.

Reference semantics are cited per module as ``/root/reference/src/<file>:<lines>``.
"""

__version__ = "0.1.0"
