from debias_spark.annotate.annotator import (
    ANNOTATION_FIELDS,
    TAG_SCHEMA,
    AnnotateConfig,
    analytics_frame,
    annotate,
    flagged,
)
from debias_spark.annotate.lexicon import DEFAULT_LEXICON, LexiconClient

__all__ = [
    "ANNOTATION_FIELDS",
    "TAG_SCHEMA",
    "AnnotateConfig",
    "analytics_frame",
    "annotate",
    "flagged",
    "DEFAULT_LEXICON",
    "LexiconClient",
]
