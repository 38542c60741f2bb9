from whoosh_spark.streaming.incremental import (  # noqa: F401
    IncrementalIndexer,
    index_stream,
)
from whoosh_spark.streaming.percolate import (  # noqa: F401
    percolate,
    percolate_indexed,
    percolate_stream,
)
