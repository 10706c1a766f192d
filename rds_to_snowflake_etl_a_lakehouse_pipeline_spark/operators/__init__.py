"""Relational / dataflow operators: windows, joins, aggregates,
dedup (exact + fuzzy), similarity search, multimodal plumbing,
corpus curation (packing / sampling / selection / reweighting),
entity resolution (blocking / scoring / clustering / survivorship)."""

from .curation import (  # noqa: F401
    global_shuffle,
    mixture_weights,
    pack_sequences,
    stratified_sample,
    topk_per_group,
)
from .entity import (  # noqa: F401
    er_candidate_pairs,
    golden_records,
    resolve_entities,
)
from .features import (  # noqa: F401
    minmax_scale,
    one_hot,
    target_encode,
    zscore_scale,
)
from .joins import (  # noqa: F401
    bloom_prune,
    bloom_semi_join,
    build_key_bloom,
    skew_report,
    star_join,
)
from .sketches import (  # noqa: F401
    distinct_sketches,
    rollup_sketches,
    sketch_estimate,
)
from .windows import (  # noqa: F401
    dedupe_latest,
    event_transitions,
    interarrival_stats,
    merge_upsert,
    retention_cohorts,
    retention_from_pairs,
    rolling_quantile,
    scd2_close,
    session_stats,
    sessionize,
    surrogate_key,
    surrogate_key_two_phase,
)
