from whoosh_spark.search.executor import Searcher  # noqa: F401
from whoosh_spark.search.scoring import BM25F, TF_IDF, Frequency  # noqa: F401
