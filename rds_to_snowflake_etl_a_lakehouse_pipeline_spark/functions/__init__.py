"""Scalar function surface: cleansing/repair rules, text analysis, vectors."""

from .charlm import (  # noqa: F401
    CharLM,
    score_char_lm,
    train_char_lm,
)
from .cleansing import (  # noqa: F401
    backfill_unit_price,
    category_id_from_key,
    coalesce_zero,
    int_yyyymmdd_to_date,
    map_codes,
    null_if_future,
    prefer_source,
    product_number_from_key,
    recompute_amount,
    strip_chars,
    strip_prefix,
    trim_columns,
)
from .text import (  # noqa: F401
    approx_bpe_token_count,
    chunk_documents,
    dedupe_lines,
    doc_fingerprint,
    gopher_quality_flags,
    hash_bucket,
    hash_split,
    language_id,
    quality_score,
    regex_token_count,
    repetition_ratio,
    scrub_pii,
    stopword_ratio,
    token_count,
    winnow_fingerprints,
)
from .vectors import (  # noqa: F401
    cosine_from_norms,
    cosine_similarity,
    dot_product,
    int8_dequantize,
    int8_quantize,
    l2_norm,
    sign_matrix,
    sign_project,
)
