"""Relational operators (filters, dedup, joins, windows, unpivot,
similarity search) — each a DataFrame→DataFrame transform built on
Spark SQL primitives so Catalyst plans them."""

from .filters import (  # noqa: F401
    thai_filter,
    nonempty_filter,
    placeholder_filter,
    regnum_validate_filter,
    candidate_row_filter,
    year_filter,
    field_filter,
    similarity_threshold_filter,
)
from .dedup import (  # noqa: F401
    dedup_prefer_reg,
    exact_dedup,
    contamination_pairs,
    ngram_jaccard_pairs,
    minhash_signature,
    minhash_lsh_pairs,
    simhash64,
    simhash_pairs,
)
from .joins import (  # noqa: F401
    exact_core_join,
    strategy_ranked_first_match,
    similarity_fallback_join,
    anti_join_not_found,
    existing_reg_split,
    asof_join,
)
from .graph import component_survivors, connected_components  # noqa: F401
from .clustering import (  # noqa: F401
    cluster_balanced_sample,
    cluster_distance_filter,
    kmeans_assign,
    kmeans_fit,
    load_centers,
    load_projection,
    pca_fit,
    pca_project,
    save_centers,
    save_projection,
    semantic_dedup,
)
from .domains import (  # noqa: F401
    domain_blocklist_filter,
    extract_domain,
    per_domain_cap,
    registrable_domain,
    registrable_host,
)
from .mixing import (  # noqa: F401
    mix_corpora,
    mix_rates,
    temperature_mix,
    temperature_weights,
)
from .sampling import quality_bucket_sample, sample_bucket  # noqa: F401
from .segments import segment_dedup  # noqa: F401
from .substrings import substring_dedup  # noqa: F401
from .sharding import pack_shards  # noqa: F401
from .chunking import chunk_documents  # noqa: F401
from .profiling import profile_table  # noqa: F401
from .windows import top1_per_group, topk_per_group  # noqa: F401
from .unpivot import unpivot_financials  # noqa: F401
from .similarity_search import (  # noqa: F401
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    ivf_append,
    ivf_build,
    ivf_rebuild_advised,
    ivf_recall_check,
    ivf_search,
    ivf_stats,
    ivf_topk,
)
from .packing import (  # noqa: F401
    apply_pack_stage,
    pack_sequences,
    packing_stats,
)
from .dsir import (  # noqa: F401
    dsir_filter,
    dsir_fit,
    dsir_score,
    load_dsir,
    save_dsir,
)
