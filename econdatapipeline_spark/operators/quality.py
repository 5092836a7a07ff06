"""Data-quality validation: declarative expectations over a DataFrame.

The reference's only "validation" is pd.to_numeric(errors='coerce') +
dropna — bad cells vanish silently (azure_common_scrapers.py:133-138).
A pipeline feeding model training needs the opposite: declared
expectations, counted violations, and a machine-readable report that
can gate promotion of a batch (the Deequ/Great-Expectations shape,
rebuilt as one Spark aggregation).

Scale design: every check compiles to a conditional-count column in a
SINGLE aggregate pass over the table — one scan, one 1-row result, no
per-check jobs. Uniqueness, the only check that needs a shuffle, is an
optional second aggregate (count vs distinct count on the key).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation: name + row-level predicate that should hold."""

    name: str
    predicate: Column


def not_null(col: str) -> Check:
    return Check(f"{col}_not_null", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Check:
    return Check(f"{col}_in_range", F.col(col).between(lo, hi))


def matches(col: str, pattern: str) -> Check:
    return Check(f"{col}_matches", F.col(col).rlike(pattern))


def one_of(col: str, values: list) -> Check:
    return Check(f"{col}_one_of", F.col(col).isin(values))


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """One-row violation report: (total_rows, <check>_violations...).

    A violation is a row where the predicate is NOT satisfied (null
    predicate results count as violations — an unparseable value is a
    failure, not a pass; use not_null explicitly when nulls are legal).
    """
    aggs = [F.count(F.lit(1)).alias("total_rows")]
    for c in checks:
        holds = F.coalesce(c.predicate, F.lit(False))
        aggs.append(
            F.sum(F.when(~holds, 1).otherwise(0)).alias(f"{c.name}_violations")
        )
    return df.agg(*aggs)


def check_unique(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """(n_keys, n_dup_keys, n_dup_rows) uniqueness report for a key."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("__n") > 1, 1).otherwise(0)).alias("n_dup_keys"),
        F.sum(F.when(F.col("__n") > 1, F.col("__n")).otherwise(0)).alias("n_dup_rows"),
    )


def table_checksum(
    df: DataFrame, cols: list[str], group_by: list[str] | None = None
) -> DataFrame:
    """Order-independent content checksum: the anti-entropy primitive for
    verifying replicas / migrations / re-partitions hold identical data.

    Each row is canonicalized to ``v1|v2|...`` (nulls as ``\\N``),
    md5-hashed, the first 15 hex digits taken as a 60-bit integer, and
    SUMMED as decimal(38,0) — addition commutes, so the digest is
    invariant under row order, partitioning, and engine, and any single
    changed cell changes it. One scan, map-side partial sums, a 1-row
    (or per-group) result; at 100 TB this is the cheapest whole-table
    equality test that exists, and grouping by a partition column yields
    per-partition digests for incremental reconciliation.

    Float columns must be canonicalized by the caller (cast to a fixed-
    scale decimal first): raw double->string rendering is engine- and
    locale-specific, ints / strings / dates / decimals are not.
    """
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\\N")) for c in cols]
    row_h = F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 15), 16, 10).cast(
        "long"
    )
    # Sum the 60-bit hashes exactly WITHOUT per-row BigDecimal: split
    # each hash into four 15-bit limbs, sum each limb as a long (pure
    # codegen arithmetic — benches ~2x faster than summing
    # decimal(38,0) rows), and recombine the four partial sums into the
    # exact big integer once per output group. A limb sum stays below
    # 2^63 up to 2^48 rows per group — beyond any real partition.
    limbs = [
        F.sum(F.shiftright(row_h, 45)).alias("_s3"),
        F.sum(F.shiftright(row_h, 30).bitwiseAND(0x7FFF)).alias("_s2"),
        F.sum(F.shiftright(row_h, 15).bitwiseAND(0x7FFF)).alias("_s1"),
        F.sum(row_h.bitwiseAND(0x7FFF)).alias("_s0"),
    ]
    agg = [F.count(F.lit(1)).alias("n_rows"), *limbs]
    out = df.groupBy(*group_by).agg(*agg) if group_by else df.agg(*agg)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    checksum = (
        dec("_s3") * F.lit(2**45).cast("decimal(38,0)")
        + dec("_s2") * F.lit(2**30).cast("decimal(38,0)")
        + dec("_s1") * F.lit(2**15).cast("decimal(38,0)")
        + dec("_s0")
    )
    keep = [*(group_by or []), "n_rows"]
    return out.select(*keep, checksum.cast("decimal(38,0)").cast("string").alias("checksum"))


def profile_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass numeric profile -> (column, n, mean, variance, min, max).

    The data-profiling primitive (schema drift checks, feature sanity,
    migration validation): every statistic for every column comes out
    of ONE aggregate over one scan — count, exact-decimal sum and sum
    of squares, min, max per column — then the long output is a stack
    of the single result row, so profiling k columns costs one job and
    no shuffle beyond the final 1-row aggregate.

    Mean and population variance are derived from the exact decimal
    sums in one double-arithmetic chain (var = sumsq/n - (sum/n)^2
    rearranged as (sumsq - sum^2/n) / n), so any engine computing the
    same chain over the same exact sums reproduces them bit-for-bit;
    both are rounded to 6 decimals at the edge.
    """
    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        aggs += [
            F.count(col).alias(f"__n_{c}"),
            F.sum(col.cast("decimal(38,6)")).cast("double").alias(f"__s_{c}"),
            F.sum((col * col).cast("decimal(38,6)")).cast("double").alias(f"__q_{c}"),
            F.min(col).alias(f"__min_{c}"),
            F.max(col).alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = []
    for c in cols:
        n = F.col(f"__n_{c}")
        s = F.col(f"__s_{c}")
        q = F.col(f"__q_{c}")
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                n.alias("n"),
                F.round(s / n, 6).alias("mean"),
                F.round((q - s * s / n) / n, 6).alias("variance"),
                F.col(f"__min_{c}").alias("min"),
                F.col(f"__max_{c}").alias("max"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def quantile_filter(
    df: DataFrame,
    score_col: str,
    min_quantile: float,
) -> DataFrame:
    """Drop the bottom ``min_quantile`` fraction by ``score_col`` ->
    surviving rows + the global ``cutoff`` they cleared.

    The canonical corpus-hygiene gate ("drop the worst 25% by quality
    score") needs the threshold computed from the DATA, not hard-coded
    — an absolute threshold tuned on one crawl is wrong on the next.
    One exact-percentile aggregate produces the scalar cutoff; it
    broadcasts back onto the scan as a join-free filter (a 1-row
    cross-joined relation Catalyst folds into a BroadcastNestedLoopJoin
    over a single row — effectively a literal).

    Exact percentile at 100 TB is a full-pass sort-based aggregate; if
    that pass ever dominates, ``approx_percentile`` with a 1e-4
    relative error is the drop-in (the cutoff moves by less than the
    score noise) — kept exact here so the cross-engine oracle matches
    bit-for-bit (linear interpolation on the sorted column is the same
    formula as DuckDB's quantile_cont).
    """
    if not 0.0 <= min_quantile < 1.0:
        raise ValueError(f"min_quantile must be in [0, 1), got {min_quantile}")
    cut = df.agg(
        F.expr(f"percentile({score_col}, {min_quantile!r})").alias("cutoff")
    )
    return df.join(F.broadcast(cut)).filter(F.col(score_col) >= F.col("cutoff"))


def validate_samples(
    df: DataFrame,
    checks: list[Check],
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Violation report WITH evidence: (check, n_violations, sample_ids).

    ``validate`` answers "how many rows fail each rule"; triage needs
    "show me some". One pass: each failing row emits one row per rule
    it breaks (a bounded explode — ≤ |checks| per input row), then a
    per-rule aggregate counts violations and keeps the k SMALLEST
    offending ids (min-k via sorted array slice of a collect_set that
    the per-rule row_number window bounds first). Deterministic: the
    sample is the k smallest ids, not "any k", so reruns and the SQL
    oracle agree exactly.

    Scale shape: the explode emits rows only for FAILURES (a healthy
    table contributes nothing); the per-rule top-k window shuffles one
    row per failure, partitioned by rule — bounded by failure volume,
    never table size.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    fails = []
    for c in checks:
        holds = F.coalesce(c.predicate, F.lit(False))
        fails.append(
            F.when(~holds, F.struct(F.lit(c.name).alias("check")))
        )
    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.filter(F.array(*fails), lambda x: x.isNotNull())
        ).alias("f"),
    ).select(F.col("f.check").alias("check"), "_id")
    w = Window.partitionBy("check").orderBy(F.asc("_id"))
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("check")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_violations"),
            F.array_sort(
                F.collect_list(F.when(F.col("rn") <= k, F.col("_id")))
            ).alias("sample_ids"),
        )
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Re-identification risk report per quasi-identifier class ->
    (quasi_cols..., class_size, at_risk[, n_sensitive]).

    A release is k-anonymous when every combination of quasi-
    identifiers (the columns an attacker can link externally) appears
    at least k times (Sweeney 2002). One hash aggregate over the
    quasi-identifier tuple; ``at_risk`` marks classes smaller than k —
    the rows a suppression/generalization pass must treat before
    export. With ``sensitive_col``, ``n_sensitive`` adds the class's
    distinct sensitive-value count (l-diversity, Machanavajjhala 2007):
    a k-anonymous class with one sensitive value still leaks it.

    Shape: one groupBy on the quasi tuple (map-side combinable; the
    distinct-count for l-diversity is the only addition) — the report
    is |classes|-sized however large the table.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    aggs = [F.count(F.lit(1)).cast("long").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(sensitive_col).cast("long").alias("n_sensitive")
        )
    out = df.groupBy(*quasi_cols).agg(*aggs)
    return out.withColumn("at_risk", F.col("class_size") < k)


def anonymity_summary(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """One-row rollup of k_anonymity: (n_rows, n_classes, min_class,
    n_at_risk_classes, n_at_risk_rows, k_anonymous) — the release gate
    a pipeline can assert on without materializing the class report."""
    classes = k_anonymity(df, quasi_cols, k)
    return classes.agg(
        F.sum("class_size").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("class_size").cast("long").alias("min_class"),
        F.sum(F.when(F.col("at_risk"), 1).otherwise(0))
        .cast("long")
        .alias("n_at_risk_classes"),
        F.sum(F.when(F.col("at_risk"), F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("n_at_risk_rows"),
        (F.min("class_size") >= k).alias("k_anonymous"),
    )


GOPHER_REQUIRED_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_required_stops: int = 2,
) -> DataFrame:
    """Gopher quality-rule battery (Rae et al. 2021, §A1.1) as one
    map-only pass of column expressions -> per-doc rule flags.

    The published repetition-independent document filters, each a
    boolean column (True = rule SATISFIED):

    - ``ok_words``:     word count in [min_words, max_words]
    - ``ok_word_len``:  mean word length in [min_word_len, max_word_len]
    - ``ok_symbol``:    (# '#' chars + # ellipses) / words <= 0.1
    - ``ok_bullet``:    <= 90% of lines start with a bullet (-, *, •)
    - ``ok_ellipsis``:  <= 30% of lines end with an ellipsis
    - ``ok_alpha``:     >= 80% of words contain an [a-z] character
    - ``ok_stops``:     >= 2 distinct required stopwords present
    - ``gopher_pass``:  AND of all seven

    The alphabetic and stopword rules are English-biased exactly as
    published — CJK text fails them by design; run the battery after a
    language split (langid) as Gopher does. No reference analog (the
    reference has no text-quality surface); the repetition half of
    Gopher's filters lives in contamination.repetition_scores.

    Scale: narrow map-only transform, whole-stage codegen, no shuffle —
    the aggregate report is the caller's groupBy.
    """
    exprs = gopher_flag_exprs(
        text_col,
        min_words=min_words,
        max_words=max_words,
        min_word_len=min_word_len,
        max_word_len=max_word_len,
        max_symbol_ratio=max_symbol_ratio,
        max_bullet_frac=max_bullet_frac,
        max_ellipsis_frac=max_ellipsis_frac,
        min_alpha_frac=min_alpha_frac,
        min_required_stops=min_required_stops,
    )
    return df.select(
        F.col(id_col), *[v.alias(k) for k, v in exprs.items()]
    ).withColumn(
        "gopher_pass",
        F.col("ok_words")
        & F.col("ok_word_len")
        & F.col("ok_symbol")
        & F.col("ok_bullet")
        & F.col("ok_ellipsis")
        & F.col("ok_alpha")
        & F.col("ok_stops"),
    )


def gopher_flag_exprs(
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_required_stops: int = 2,
) -> dict[str, Column]:
    """The Gopher battery as NAMED COLUMN EXPRESSIONS (n_words + the
    seven ok_* flags) over ``text_col`` — the single rule
    implementation behind gopher_rules (batch select) and the
    streaming curation gate (withColumns on the live frame, which must
    not join the stream against itself: a stream-stream join would
    plan an unbounded state store for what is a stateless map)."""
    t = F.lower(F.trim(F.col(text_col)))
    toks = F.split(t, r"\s+")
    n_words = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w))
    mean_len = sum_len / F.greatest(n_words, F.lit(1))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\.|…"), 0))
    symbol_ratio = (n_hash + n_ellipsis) / F.greatest(n_words, F.lit(1))
    lines = F.transform(F.split(t, r"\n"), lambda l: F.trim(l))
    n_lines = F.greatest(F.size(lines), F.lit(1))
    n_bullet = F.size(
        F.filter(lines, lambda l: l.rlike(r"^[-*•]"))
    )
    n_ell_end = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))
    )
    n_alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
    stops = F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS])
    n_stops = F.size(F.array_intersect(toks, stops))
    return {
        "n_words": n_words.cast("long"),
        "ok_words": n_words.between(min_words, max_words),
        "ok_word_len": (mean_len >= min_word_len)
        & (mean_len <= max_word_len),
        "ok_symbol": symbol_ratio <= max_symbol_ratio,
        "ok_bullet": n_bullet / n_lines <= max_bullet_frac,
        "ok_ellipsis": n_ell_end / n_lines <= max_ellipsis_frac,
        "ok_alpha": n_alpha_words / F.greatest(n_words, F.lit(1))
        >= min_alpha_frac,
        "ok_stops": n_stops >= min_required_stops,
    }


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law ->
    (digit, n, frac, benford, abs_dev), one row per digit 1-9.

    The classic fabricated-data / unit-mixup screen for numeric fact
    columns (Benford 1938; Nigrini's audit practice): naturally
    occurring multi-scale quantities follow P(d) = log10(1 + 1/d);
    price columns pasted from a uniform generator, truncated ETL, or a
    wrong-unit merge bend the curve. One projection + one 9-group hash
    aggregate — nothing scales past the scan.

    Portability discipline: the first digit is extracted from the
    decimal(38,6) STRING rendering (both engines render full fixed
    scale, and regexp first-match of [1-9] is order-identical) — NOT
    via log10/pow, whose libm boundaries (log10(1000) rounding below
    3) flip digits at exact powers of ten. decimal(38,6) keeps
    magnitudes up to 1e32 in-audit (a decimal(18,6) cast would null
    out |values| >= 1e12 — silently excluding exactly the
    large-magnitude rows a fraud screen targets); anything past 1e32
    still nulls out and is excluded with the zeros, documented here.
    The Benford expectation is computed, not hardcoded, as
    ln(1+1/d)/ln(10) rounded to 6 on both engines. Zero/null values
    carry no leading digit and are excluded, negatives contribute
    their magnitude.
    """
    s = F.abs(F.col(value_col)).cast("decimal(38,6)").cast("string")
    d = F.regexp_extract(s, "[1-9]", 0)
    digits = (
        df.select(d.alias("ds"))
        .filter(F.col("ds") != "")
        .select(F.col("ds").cast("int").alias("digit"))
    )
    tot = digits.agg(F.count(F.lit(1)).alias("total"))
    frac = F.col("n").cast("double") / F.col("total").cast("double")
    benford = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")) / F.log(F.lit(10.0))
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(tot)
        .select(
            "digit",
            "n",
            F.round(frac, 6).alias("frac"),
            F.round(benford, 6).alias("benford"),
            F.round(F.abs(F.round(frac, 6) - F.round(benford, 6)), 6).alias(
                "abs_dev"
            ),
        )
    )


def tokenizer_fertility(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Tokenizer fertility per corpus slice -> (group, n_docs,
    n_words, n_subwords, fertility, chars_per_subword).

    Fertility = subword tokens per whitespace word (the BPE-ish regex
    pretokenizer over the corpus) — THE tokenizer-fairness metric:
    slices (languages, sources) with fertility far above the corpus
    norm pay more compute per word and truncate earlier at fixed
    sequence length; chars_per_subword is the compression view of the
    same question. One projection + one hash aggregate per slice —
    all counts exact integers, two final ratios.
    """
    from econdatapipeline_spark.functions.text import (
        bpe_ish_tokens,
        token_count,
    )

    t = F.col(text_col)
    base = df.select(
        F.col(group_col).alias("g"),
        token_count(t).cast("long").alias("w"),
        F.size(bpe_ish_tokens(t)).cast("long").alias("s"),
        F.length(t).cast("long").alias("c"),
    )
    agg = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("n_words"),
        F.sum("s").cast("long").alias("n_subwords"),
        F.sum("c").cast("long").alias("n_chars"),
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_docs",
        "n_words",
        "n_subwords",
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.col("n_subwords").cast("double")
                / F.col("n_words").cast("double"),
            ).otherwise(0.0),
            6,
        ).alias("fertility"),
        F.round(
            F.when(
                F.col("n_subwords") > 0,
                F.col("n_chars").cast("double")
                / F.col("n_subwords").cast("double"),
            ).otherwise(0.0),
            6,
        ).alias("chars_per_subword"),
    )


def dp_group_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float,
    salt: str,
) -> DataFrame:
    """Laplace-mechanism differentially-private group counts ->
    (group, n, noisy_n, claimed_epsilon).

    The release mechanism that pairs with k_anonymity's risk report:
    counts perturbed with Laplace(1/epsilon) noise satisfy
    epsilon-DP for a count query (sensitivity 1, Dwork et al. 2006).
    The noise draw is the engine's DETERMINISTIC-randomness idiom
    (bootstrap_ci's md5-uniform): u = md5(salt ':' group) mapped to
    (0, 1), then the Laplace inverse CDF
    -(1/eps)·sign(u−½)·ln(1−2|u−½|).

    THIS IS A CERTIFICATION-ORIENTED MECHANISM, NOT A PRIVATE RELEASE
    AS-IS: the noise is exactly invertible by anyone who knows salt +
    mechanism, the true `n` is carried alongside, and the guarantee
    column is therefore named ``claimed_epsilon``. ``salt`` has NO
    default — the caller must supply a fresh per-release value (a
    fixed salt re-queried leaks by averaging; a known salt leaks
    outright). At a real release boundary: drop `n`, generate the salt
    from a CSPRNG, and never reuse it.

    One map-side-combinable hash aggregate; noise is O(1/eps) doubles
    with the quantized-ln portability caveat shared by every ln-based
    query.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    if not salt:
        raise ValueError("salt is required: supply a fresh per-release value")
    agg = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{salt}:"), F.col("group").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000003
        + 1
    ).cast("double") / F.lit(1000005.0)
    # u in (0, 1) exclusive: (x % 1000003 + 1) / 1000005 <= 0.9999990...
    half = u - F.lit(0.5)
    mag = 1.0 - 2.0 * F.abs(half)
    noise = (
        -(1.0 / F.lit(float(epsilon)))
        * F.signum(half)
        * F.log(mag)
    )
    return agg.select(
        "group",
        "n",
        F.round(F.col("n").cast("double") + noise, 6).alias("noisy_n"),
        F.lit(float(epsilon)).alias("claimed_epsilon"),
    )
