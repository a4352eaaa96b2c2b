"""Engine extensions beyond the reference surface: large-scale
training-data pipeline operators (text analysis, deduplication,
similarity search, multimodal plumbing). All Spark-DataFrame-native,
designed for 100 TB-class inputs."""

from pd_utils_spark.extensions.text import (
    LANG_MARKERS,
    doc_fingerprint,
    language_id,
    rolling_hash_fingerprints,
    text_quality,
    token_count,
    token_count_bpe,
)
