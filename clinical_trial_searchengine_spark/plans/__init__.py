from clinical_trial_searchengine_spark.plans.build import build_index  # noqa: F401
from clinical_trial_searchengine_spark.plans.query import search  # noqa: F401
