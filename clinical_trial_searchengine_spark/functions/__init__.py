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
from clinical_trial_searchengine_spark.functions.criteria import (  # noqa: F401
    age_range,
    ecog_allowed,
    extract_labs,
    gender,
    hard_exclusions,
    lines_of_therapy,
    match_dictionary,
    normalize_conditions,
    parse_criteria,
    washouts,
)
from clinical_trial_searchengine_spark.functions.synonyms import (  # noqa: F401
    demo_synonyms,
    synonyms_df,
)
