"""Engine extensions beyond the reference surface: large-scale
training-data pipeline operators (text analysis, deduplication,
similarity search, multimodal plumbing). All Spark-DataFrame-native,
designed for 100 TB-class inputs."""

from pd_utils_spark.extensions.approx import (
    approx_group_stats,
    approx_group_stats_check,
)
from pd_utils_spark.extensions.dedup import (
    connected_components,
    dedup_minhash_against,
    dedup_connected,
    dedup_lines,
    dedup_minhash_lsh,
    duplicated_ngram_fraction,
    exact_dedup,
    exact_dedup_against,
    hamming_distance,
    repeated_lines,
    jaccard_pairs,
    jaccard_topk,
    lsh_candidate_pairs,
    lsh_plan,
    minhash_signature,
    near_dup_analysis,
    shingle_sets,
    simhash,
    simhash_near_dup_pairs,
    source_overlap,
    winnow_containment_pairs,
)
from pd_utils_spark.extensions.features import frequency_encode, target_encode
from pd_utils_spark.extensions.graph import bfs_levels, pagerank
from pd_utils_spark.extensions.checks import assert_checks, run_checks
from pd_utils_spark.extensions.snapshot import (
    agg_state,
    dataset_diff,
    finalize_agg_state,
    merge_agg_states,
    diff_summary,
    scd2_merge,
)
from pd_utils_spark.extensions.events import (
    cohort_retention,
    funnel_counts,
    rolling_row_stats,
    rolling_stats,
    session_paths,
    session_stats,
    suppress_repeats,
    sessionize,
    top_k_per_group,
)
from pd_utils_spark.extensions.metrics import (
    multiclass_metrics,
    multiclass_summary,
    binary_metrics,
    calibration_table,
    ndcg_at_k,
    regression_metrics,
)
from pd_utils_spark.extensions.stats import (
    fdr_bh,
    ks_2samp,
    mann_whitney_u,
    poisson_bootstrap_ci,
    poisson_bootstrap_means,
    population_stability_index,
    welch_ttest,
    caliper_match,
    conformal_split,
    cuped,
    kaplan_meier,
)
from pd_utils_spark.extensions.selection import (
    dsir_log_weights,
    dsir_select,
    hashed_ngram_features,
)
from pd_utils_spark.extensions.pii import (
    drop_pii_documents,
    pii_signals,
    redact_pii,
)
from pd_utils_spark.extensions.web import (
    canonical_url,
    canonicalize_urls,
    domain_of,
    domain_stats,
    drop_blocklisted_domains,
    extract_urls,
    url_signals,
)
from pd_utils_spark.extensions.profile import (
    benford_test,
    column_profile,
    crosstab_chi2,
    corr_matrix,
    group_quantiles,
    numeric_histogram,
    token_length_histogram,
)
from pd_utils_spark.extensions.sampling import (
    contamination_report,
    decontaminate,
    filter_top_fraction,
    hash_fraction,
    hash_split,
    interleave_sources,
    kfold_split,
    ngram_hashes,
    pack_chunks,
    pack_sequences,
    sample_n_per_group,
    skyline_2d,
    stratified_sample,
    take_token_budget,
    temperature_mix,
    weighted_sample,
)
from pd_utils_spark.extensions.similarity import (
    dedup_embeddings,
    ann_ivf_topk,
    label_centroids,
    ann_lsh_topk,
    brute_force_topk,
    cosine,
    embedding_drift,
    embedding_near_dup_pairs,
    hyperplane_signature,
    ivf_assign,
    ivf_centroid_table,
    ivf_probe_topk,
    ann_ivf_pq_topk,
    pca_fit,
    pca_project,
    pq_adc_topk,
    pq_codebook_table,
    pq_encode,
    pq_fit,
    quantize_embeddings,
    topk_recall,
)
from pd_utils_spark.extensions.linkage import (
    blocked_edit_pairs,
    edit_join,
    match_entities,
    normalize_entity,
    token_sort_key,
)
from pd_utils_spark.extensions.bpe import (
    apply_bpe,
    bpe_token_stats,
    learn_bpe,
    word_counts,
)
from pd_utils_spark.extensions.semistructured import (
    explode_variant_array,
    parse_variant,
    variant_fields,
    variant_schema_profile,
)
from pd_utils_spark.extensions.sketches import (
    cms_estimate,
    cms_merge,
    cms_sketch,
    distinct_rollup,
    distinct_rollup_audit,
    hll_estimate,
    hll_rollup,
    hll_sketch_by,
)
from pd_utils_spark.extensions.text import (
    LANG_MARKERS,
    c4_line_filter,
    doc_fingerprint,
    gopher_quality_filter,
    language_id,
    normalize_text,
    repetition_scores,
    rolling_hash_fingerprints,
    text_quality,
    tf_idf,
    chunk_documents,
    token_count,
    token_weight_score,
    token_count_bpe,
    vocabulary,
    winnowing_fingerprints,
    phrase_search,
    pmi_collocations,
)
