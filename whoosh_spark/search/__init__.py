from whoosh_spark.search.executor import (  # noqa: F401
    PartialResults,
    Searcher,
    TimeLimitError,
)
from whoosh_spark.search.evaluate import eval_run, eval_summary  # noqa: F401
from whoosh_spark.search.hybrid import (  # noqa: F401
    hybrid_topk,
    mmr_rerank,
    rocchio_expand,
    rocchio_topk,
    rrf_fuse,
)
from whoosh_spark.search.facets import (  # noqa: F401
    FieldFacet,
    FunctionFacet,
    ScoreFacet,
    StoredFieldFacet,
)
from whoosh_spark.search.scoring import (  # noqa: F401
    BM25F,
    TF_IDF,
    FinalWeighting,
    Frequency,
    FunctionWeighting,
    MultiWeighting,
    PL2,
)
