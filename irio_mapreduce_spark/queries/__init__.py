"""The declared, oracle-checked query catalog.

Importing this package loads every query module, populating the registry in
``catalog``. ``__spark_entry__.py`` (the driver contract) is a thin view over
this registry.
"""

from irio_mapreduce_spark.queries.catalog import all_oracles, all_queries, register  # noqa: F401

# Import for registration side effects. Listing order for the external
# correctness driver (which checks the FIRST 50 entries per round) is pinned
# explicitly by catalog.FRONT_WINDOW — see the rotation note there; module
# import order below only sequences the remainder. Every entry, in or out of
# the window, is oracle-tested per-entry in tests/test_oracle.py.
from irio_mapreduce_spark.queries import tpch  # noqa: E402,F401
from irio_mapreduce_spark.queries import tpch_ext  # noqa: E402,F401
from irio_mapreduce_spark.queries import functions_q  # noqa: E402,F401
from irio_mapreduce_spark.queries import events_q  # noqa: E402,F401
from irio_mapreduce_spark.queries import text_q  # noqa: E402,F401
from irio_mapreduce_spark.queries import dedup_q  # noqa: E402,F401
from irio_mapreduce_spark.queries import similarity_q  # noqa: E402,F401
from irio_mapreduce_spark.queries import multimodal_q  # noqa: E402,F401
from irio_mapreduce_spark.queries import udf_q  # noqa: E402,F401
from irio_mapreduce_spark.queries import streaming_q  # noqa: E402,F401
from irio_mapreduce_spark.queries import pipeline_q  # noqa: E402,F401
from irio_mapreduce_spark.queries import sources_q  # noqa: E402,F401
from irio_mapreduce_spark.queries import sampling_q  # noqa: E402,F401
from irio_mapreduce_spark.queries import relational  # noqa: E402,F401
from irio_mapreduce_spark.queries import stats_q  # noqa: E402,F401
from irio_mapreduce_spark.queries import graph_q  # noqa: E402,F401
from irio_mapreduce_spark.queries import ml_q  # noqa: E402,F401
from irio_mapreduce_spark.queries import slowpath_q  # noqa: E402,F401
