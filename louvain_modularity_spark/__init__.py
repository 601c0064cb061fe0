"""louvain_modularity_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference repo
``johnasbaghi/louvain-modularity`` (graph community detection via
Louvain modularity), plus the relational / LLM-data-pipeline /
streaming operator surface declared in ``SURVEY.md`` §2.

Design principles (see SURVEY.md §1.2, §4.2):

- Graphs are pairs of DataFrames: ``edges(src LONG, dst LONG, weight
  DOUBLE)`` stored once per undirected pair, and assignment tables
  ``(id LONG, community LONG)``.
- Everything is declarative DataFrame / SQL; Catalyst + AQE pick the
  physical plan. No RDDs, no custom Catalyst rules.
- Iterative algorithms (Louvain, label propagation, connected
  components) are driver-side Python loops over DataFrame jobs with
  ``lineage_cut`` (session.py) per iteration to truncate lineage —
  eager localCheckpoint locally, reliable checkpoint() when
  ``spark.graft.checkpointDir`` points at a fault-tolerant store.
- Python touches data only through Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
