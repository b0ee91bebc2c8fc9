from clinical_trial_searchengine_spark.sources.corpus import (  # noqa: F401
    generate_corpus_df,
    generate_corpus_pandas,
    reference_queries,
)
from clinical_trial_searchengine_spark.sources.tables import load_table  # noqa: F401
