from distributed_stream_processing_spark.plans.registry import (
    QUERIES,
    QuerySpec,
    query,
    load_all,
)

__all__ = ["QUERIES", "QuerySpec", "query", "load_all"]
