"""Pure column-expression functions (JVM-side, whole-stage-codegen'd).

Nothing in this package is a Python UDF: every transform is a
composition of built-in ``pyspark.sql.functions``, so the whole scalar
layer runs inside Tungsten codegen at any scale.
"""

from .text_norm import (  # noqa: F401
    collapse_ws,
    normalize_company_name,
    extract_core_name,
    clean_filler_words,
    remove_parentheses,
    remove_trailing_numbers,
    FILLER_REGEX,
)
from .parsing import (  # noqa: F401
    parse_money,
    parse_year_header,
    extract_regnum,
    extract_labeled_regnum,
    validate_regnum,
    match_type_label,
    total_pages_parse,
)
from .similarity import (  # noqa: F401
    tokenize_ws,
    token_jaccard,
)
from .search_terms import generate_search_terms  # noqa: F401
from .pii import (  # noqa: F401
    pii_counts,
    redact_pii,
)
from .splits import content_split  # noqa: F401
from .text_analysis import (  # noqa: F401
    gopher_filter,
    gopher_metrics,
    gopher_quality_flags,
    validate_gopher_overrides,
    token_count,
    char_classes,
    quality_score,
    lang_id,
    doc_fingerprint,
    shingles,
    shingles_vec,
    token_rarity_scores,
    repetition_stats,
    tfidf_topk,
)
from .vectors import (  # noqa: F401
    dot,
    l2_norm,
    cosine_similarity,
)
from .html import (  # noqa: F401
    extract_html_title,
    html_visible_ratio,
    strip_html,
)
from .lm import (  # noqa: F401
    ngram_lm_fit,
    ngram_lm_score,
    perplexity_filter,
    save_lm,
    load_lm,
)
from .c4 import (  # noqa: F401
    c4_clean,
    c4_clean_text,
    c4_page_flags,
)
