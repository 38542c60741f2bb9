from whoosh_spark.indexing.build import InvertedIndex, build_index  # noqa: F401
from whoosh_spark.indexing.docids import assign_doc_ids  # noqa: F401
