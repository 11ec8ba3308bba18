"""Sources & sinks: the storage plane.

The reference supports five storage backends (Kafka cluster, Kafka REST
proxy, local FS, S3, Azure Blob — SURVEY §2.1). On Spark the multi-backend
abstraction collapses into two cases:

* **Kafka** — Spark's built-in connector (``format("kafka")``), wrapped by
  :mod:`kafi_spark.sources.kafka` with the reference's offset/timestamp
  bound semantics.
* **Everything else** — a path scheme (``file://``, ``s3a://``,
  ``abfss://``) under the same parquet topic layout, implemented by
  :mod:`kafi_spark.sources.fs_topic`.
"""

from kafi_spark.sources.schema import MESSAGE_SCHEMA, message_schema
from kafi_spark.sources.fs_topic import FSTopicStorage

__all__ = ["MESSAGE_SCHEMA", "message_schema", "FSTopicStorage"]
