"""kafi_spark — a PySpark-native analytics engine with the capabilities of
xdgrulez/kafi (batch "shell" over Kafka/file topics + incremental Streams),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the incremental layer, pandas UDFs as the escape hatch.

Nothing in this package is a port of the reference implementation; the
reference (pure-Python, dict-at-a-time, single-process) only defines the
*semantics*. Citations in docstrings (``kafi/...:line``) point at the
reference file that defines the behavior being matched.
"""

from kafi_spark.session import get_spark
from kafi_spark.storage import Local

__version__ = "0.1.0"

__all__ = ["get_spark", "Local", "__version__"]
