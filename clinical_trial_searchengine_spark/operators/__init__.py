from clinical_trial_searchengine_spark.operators.topk import (  # noqa: F401
    minmax_normalize,
    paginate,
    rrf_fuse,
    topk,
)
from clinical_trial_searchengine_spark.operators.dedup import (  # noqa: F401
    exact_duplicates,
    minhash_lsh_duplicates,
    ngram_jaccard_pairs,
    simhash_duplicates,
)
from clinical_trial_searchengine_spark.operators.similarity import (  # noqa: F401
    cosine_topk,
    cosine_topk_lsh,
)
from clinical_trial_searchengine_spark.operators.feasibility import (  # noqa: F401
    feasibility_filter,
    feasibility_score,
    parse_trials,
    rank_with_feasibility,
)
