from .text import (  # noqa: F401
    ENGLISH_STOPWORDS,
    fts_match_all,
    fts_match_any,
    sql_tokens,
    sql_ts_tokens,
    tokens,
    ts_tokens,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
