from clinical_trial_searchengine_spark.functions.analysis import (  # noqa: F401
    STOPWORDS,
    analyze_batch,
    make_analyze_udf,
    porter_stem,
    term_counts,
    tokenize_text,
)
from clinical_trial_searchengine_spark.functions.codec import (  # noqa: F401
    decode_postings,
    encode_postings,
)
