"""Python-worker daemon with the Arrow/pandas stack PRE-IMPORTED.

Spark's stock worker daemon (``python -m pyspark.daemon pyspark.worker``)
imports ``pyspark.worker`` once and then fork()s a worker per task, so
everything imported at daemon startup is inherited by every worker for
free via copy-on-write. ``pyspark.worker`` transitively imports numpy but
NOT pandas/pyarrow — each forked worker pays that import (~1 s CPU) the
first time it evaluates a pandas UDF / mapInPandas stage.

That cost is invisible until a stage needs MANY fresh workers at once:
a chain of K mapInPandas operators in one stage runs K PythonRunner
levels per task, so a 32-task stage wants 32·K live workers. The first
such stage in a session triggers a spawn storm — measured r12 (this
round): ~96 simultaneous forks each importing pandas+pyarrow turned a
~1 s multimodal decode chain into 10-28 s, moving between entries with
worker-pool history. Pre-importing in the daemon makes every fork
inherit the loaded stack: the storm cost collapses to plain fork().

Wired via ``spark.python.daemon.module`` in ``session.get_spark`` (the
documented hook for a custom daemon). Import failures are tolerated —
a cluster image without pandas still serves non-pandas UDFs exactly as
the stock daemon would. The tail of this module mirrors
``pyspark/daemon.py``'s ``__main__`` entry verbatim: ``manager()`` reads
the worker module name from argv exactly as the stock daemon does.
"""

try:  # pre-import the Arrow/pandas stack for copy-on-write inheritance
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyarrow.pandas_compat  # noqa: F401  (first to_pandas pulls it)
    import pyspark.sql.pandas.serializers  # noqa: F401  (Arrow UDF runners)
except ImportError:  # pragma: no cover - image without the pandas stack
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
