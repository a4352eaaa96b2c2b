"""PII detection and redaction for training-data curation.

Standard pre-training scrub stage (C4/Dolma-style pipelines redact
emails, phone numbers, IP addresses, and id numbers before release).
Everything here is pure column expressions over Spark's JVM regex
engine — whole-stage codegen, no Python in the row path, no shuffle.

Pattern dialect contract: every pattern uses only the regex subset
with identical semantics in Java (Spark), RE2 (DuckDB/Go engines),
and PCRE — character classes, bounded repetition, non-capturing
groups, ``\\b`` word boundaries. No lookaround, no backreferences, no
alternation whose branches overlap (leftmost-first vs leftmost-longest
engines would disagree). Redactions apply in a FIXED order
(email → ssn → phone → ipv4) so cascaded rewrites are identical in
every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: applied top-to-bottom during redaction. Order matters —
# e.g. the SSN pattern would match inside a phone number, so SSN
# runs before phone, and both run after email (digits in a local
# part stay intact once the email is already redacted).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

DEFAULT_REPLACEMENTS: dict[str, str] = {
    "email": "<EMAIL>",
    "ssn": "<SSN>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def pii_signals(
    df: DataFrame,
    textcol: str = "text",
    kinds: list[str] | None = None,
    prefix: str = "n_",
) -> DataFrame:
    """Per-document PII hit counts: one ``n_<kind>`` int column per
    pattern plus ``n_pii_total``. Counts are non-overlapping matches
    scanned left to right on the RAW text (each pattern scans
    independently — a phone number inside an email-like token counts
    for both, exactly as each engine's regexp_count reports it).
    """
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    out = df
    total = F.lit(0)
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        c = F.regexp_count(F.col(textcol), F.lit(pat))
        out = out.withColumn(f"{prefix}{kind}", c)
        total = total + F.col(f"{prefix}{kind}")
    return out.withColumn(f"{prefix}pii_total", total)


def redact_pii(
    df: DataFrame,
    textcol: str = "text",
    out: str | None = None,
    kinds: list[str] | None = None,
    replacements: dict[str, str] | None = None,
) -> DataFrame:
    """Replace PII spans with typed placeholder tokens, cascading the
    patterns in the fixed ``PII_PATTERNS`` order (email → ssn → phone
    → ipv4). ``out=None`` rewrites ``textcol`` in place.
    """
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    reps = {**DEFAULT_REPLACEMENTS, **(replacements or {})}
    col: Column = F.col(textcol)
    for kind in kinds:
        col = F.regexp_replace(col, PII_PATTERNS[kind], reps[kind])
    return df.withColumn(out or textcol, col)


def drop_pii_documents(
    df: DataFrame,
    textcol: str = "text",
    kinds: list[str] | None = None,
    max_hits: int = 0,
) -> DataFrame:
    """Drop documents whose total PII hit count exceeds ``max_hits``
    (default: any hit drops). The strict cousin of ``redact_pii`` for
    corpora where redaction artifacts are unacceptable; pure filter,
    pushed into the scan."""
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    total = None
    for kind in kinds:
        c = F.regexp_count(F.col(textcol), F.lit(PII_PATTERNS[kind]))
        total = c if total is None else total + c
    return df.filter(total <= max_hits)


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: str | list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns: one
    row ``(n_rows, n_groups, min_group_size, n_violating_groups,
    n_violating_rows, violating_row_frac)`` where a group is every
    distinct quasi-identifier combination (nulls form their own
    level, as they do for a linker) and a violation is a group with
    fewer than ``k`` rows — those rows are re-identifiable by joining
    the quasi-identifiers against an external dataset, the exact risk
    k-anonymity (Sweeney 2002) measures. Run it before releasing any
    per-user cut of a dataset.

    Scale shape: one hash aggregation to the group level (map-side
    partial combine), one tiny aggregate over group sizes — shuffle
    volume is O(distinct quasi-identifier combinations), and nothing
    is collected. Pair with ``redact_pii``/``drop_pii_documents``
    (column-level scrubbing) — this measures the LINKAGE risk those
    cannot see.
    """
    from pd_utils_spark.utils import to_list

    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    cols = to_list(quasi_cols)
    per = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__n__"))
    viol = F.col("__n__") < k
    return per.groupBy().agg(
        F.sum("__n__").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("__n__").alias("min_group_size"),
        F.sum(viol.cast("long")).alias("n_violating_groups"),
        F.sum(F.when(viol, F.col("__n__")).otherwise(F.lit(0))).alias(
            "n_violating_rows"
        ),
        (
            F.sum(F.when(viol, F.col("__n__")).otherwise(F.lit(0)))
            .cast("double")
            / F.sum("__n__").cast("double")
        ).alias("violating_row_frac"),
    )
