"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference semi-stream processing research repo
(DS-Join / DSim-Join / S3M), re-expressed Spark-first.

Everything here is DataFrame/SQL-declarative so Catalyst plans the
physical execution (pushdown, broadcast, AQE); Python/pandas UDFs are
used only where built-in operators genuinely cannot express the
semantics (DTW verification, stateful controllers).
"""

from distributed_stream_processing_spark.session import get_spark
from distributed_stream_processing_spark.catalog import Catalog

__all__ = ["get_spark", "Catalog"]
__version__ = "0.1.0"
