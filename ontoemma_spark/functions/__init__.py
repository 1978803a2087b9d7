from ontoemma_spark.functions.stopwords import ENGLISH_STOPWORDS
from ontoemma_spark.functions.text import (
    acronym,
    char_ngrams,
    clean,
    canonicalize,
    idf,
    jaccard,
    normalize_string,
    tokenize,
)

__all__ = [
    "ENGLISH_STOPWORDS",
    "acronym",
    "char_ngrams",
    "clean",
    "canonicalize",
    "idf",
    "jaccard",
    "normalize_string",
    "tokenize",
]
