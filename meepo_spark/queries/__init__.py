"""Graded query modules — importing this package registers every query.

Module ↔ SURVEY.md §2 mapping:
  core.py        P1-P2, G1-G2, G6, F1-F4, flagship Q1    (M0/M1)
  joins.py       J1-J7                                    (M1/M2)
  sort_set.py    O1-O4                                    (M1)
  windows.py     W1-W3, G3-G4, G7                         (M2)
  semistruct.py  F5-F7 (array/map/json)                   (M2)
  llm.py         L1-L5, text-analysis suite               (M5)
  parity.py      event-store replay/query/rebuild (A7-A10)(M3)
  streaming_batch.py  T2-T4 batch-expressible window aggs (M4)
"""

from meepo_spark.queries import core  # noqa: F401
from meepo_spark.queries import joins  # noqa: F401
from meepo_spark.queries import sort_set  # noqa: F401
from meepo_spark.queries import windows  # noqa: F401
from meepo_spark.queries import semistruct  # noqa: F401
from meepo_spark.queries import llm_text  # noqa: F401
from meepo_spark.queries import llm_dedup  # noqa: F401
from meepo_spark.queries import llm_sim  # noqa: F401
from meepo_spark.queries import llm_multimodal  # noqa: F401
from meepo_spark.queries import llm_pipeline  # noqa: F401
from meepo_spark.queries import parity  # noqa: F401
from meepo_spark.queries import quality  # noqa: F401
from meepo_spark.queries import streaming_batch  # noqa: F401
from meepo_spark.queries import timeseries  # noqa: F401
from meepo_spark.queries import sources  # noqa: F401
from meepo_spark.queries import analytics  # noqa: F401
from meepo_spark.queries import analytics2  # noqa: F401
from meepo_spark.queries import analytics3  # noqa: F401
from meepo_spark.queries import reshape  # noqa: F401
from meepo_spark.queries import mining  # noqa: F401
from meepo_spark.queries import udf_surface  # noqa: F401
from meepo_spark.queries import sql_entry  # noqa: F401
from meepo_spark.queries import graph_rank  # noqa: F401
from meepo_spark.queries import ml_train  # noqa: F401
