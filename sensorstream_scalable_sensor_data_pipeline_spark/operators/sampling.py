"""Deterministic sampling & dataset splitting (§2.12 extension).

Training-data pipelines need *reproducible* subsetting: the same
document must land in the same split on every run, on any cluster, at
any partitioning — otherwise incremental re-runs leak holdout data
into training. Spark's ``sample``/``sampleBy`` are seeded-random per
partition (repartition → different sample), so the engine uses
content-keyed hash bucketing instead: bucket = first 7 md5 hex digits
of the key as an integer, mod 1000. Pure column math — no shuffle, no
UDF, stable across engines (the same conv/substr/md5 identity the
MinHash family uses, verified bit-identical in DuckDB).

Scale notes: both operators are scan-speed map-side projections or
filters; a split/sample of a 100 TB corpus reads and writes but never
shuffles. Per-mille granularity bounds quantization error at 0.1%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Per-mille bucket space: 0.1% granularity.
BUCKETS = 1000


def hash_bucket(key: Column, buckets: int = BUCKETS, salt: str | None = None) -> Column:
    """Deterministic [0, buckets) bucket from a key column (any type;
    cast to string first). ``salt`` decorrelates independent uses of
    the same key: without it, a 10% sample and a 10% holdout of the
    same column select the *identical* rows — perfectly overlapping
    subsets whenever two bucketed operators compose. DuckDB twin:
    ``('0x' || substr(md5('<salt>:' || CAST(k AS VARCHAR)), 1, 7))::BIGINT
    % buckets`` (no ``'<salt>:'`` prefix when unsalted)."""
    s = key.cast("string")
    if salt is not None:
        s = F.concat(F.lit(f"{salt}:"), s)
    h = F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long")
    return h % F.lit(buckets)


def hash_split(
    df: DataFrame,
    key_col: str,
    holdout_per_mille: int = 100,
    out: str = "split",
    salt: str | None = "split",
) -> DataFrame:
    """Reproducible train/holdout split: rows whose key bucket falls
    below ``holdout_per_mille`` are 'holdout', the rest 'train'.
    Content-keyed, so re-ingested or re-partitioned data keeps its
    assignment — the split is a property of the data AND of the salt,
    not of the run. The default salt differs from
    :func:`stratified_hash_sample`'s so composing a split with a
    sample on the same key never selects exactly the holdout rows.

    .. warning:: **v-r2 → v-r3 split-assignment break.** r2 shipped
       unsalted buckets (``salt=None`` semantics); r3 made
       ``salt="split"`` the default to decorrelate from sampling.
       The two assignments are unrelated: a holdout set persisted by
       the r2 engine is NOT this default's holdout — mixing eras
       contaminates the holdout. Migrating deployments must either
       pass ``salt=None`` explicitly to keep their historical
       assignment, or re-materialize every split from scratch under
       the new default and retire the old artifacts. (Also noted in
       COVERAGE.md.)"""
    b = hash_bucket(F.col(key_col), salt=salt)
    return df.withColumn(
        out,
        F.when(b < holdout_per_mille, F.lit("holdout")).otherwise(F.lit("train")),
    )


def sample_to_token_budget(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    tokens_col: str,
    budget_tokens: dict[str, int],
    salt: str | None = "mixture",
    totals: dict[str, int] | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Training-mixture construction: downsample each stratum (e.g.
    language, domain, quality tier) to approximately its TOKEN budget
    — the way a pretraining mixture is specified ("300 B English web,
    30 B code, ..."), not in document counts.

    Two steps, both deterministic: (1) one map-side-combined aggregate
    measures each stratum's total tokens (one row per stratum to the
    driver — bounded by mixture size, never data-sized); (2) each
    stratum's keep-rate ``min(1000, ceil(budget/total·1000))`` feeds
    :func:`stratified_hash_sample`, so selection is the usual
    content-keyed scan-speed filter — re-runs, re-partitions, and
    incremental extensions of the corpus keep their selections.
    Strata absent from ``budget_tokens`` are dropped (rate 0).

    Returns ``(sampled frame, per-mille rates)`` — the rates are the
    reproducibility artifact to log with the run. Quantization: rates
    are per-mille floors of the hash space, so realized token counts
    land within ~0.1% of ``rate/1000 × total`` plus per-document
    granularity; budgets above a stratum's total keep the whole
    stratum (rate 1000).
    """
    import math

    if totals is None:
        totals = {
            r[strata_col]: int(r["_t"])
            for r in df.groupBy(strata_col)
            .agg(F.sum(F.col(tokens_col)).alias("_t"))
            .collect()
        }
    rates = {}
    for stratum, budget in budget_tokens.items():
        total = totals.get(stratum, 0)
        if total <= 0:
            continue
        rates[stratum] = min(BUCKETS, math.ceil(budget / total * BUCKETS))
    sampled = stratified_hash_sample(
        df, key_col, strata_col, rates, default_per_mille=0, salt=salt
    )
    return sampled, rates


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions_per_mille: dict[str, int],
    default_per_mille: int = 0,
    salt: str | None = "sample",
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its key
    bucket < the stratum's per-mille fraction. The declarative,
    reproducible form of ``sampleBy`` — rebalancing a skewed corpus
    (e.g. downsample boilerplate-heavy domains) without randomness.
    Unknown strata fall back to ``default_per_mille``. Salted
    independently of :func:`hash_split` (see :func:`hash_bucket`)."""
    b = hash_bucket(F.col(key_col), salt=salt)
    thresh = F.lit(default_per_mille)
    for stratum, pm in sorted(fractions_per_mille.items()):
        thresh = F.when(F.col(strata_col) == stratum, F.lit(pm)).otherwise(thresh)
    return df.filter(b < thresh)


def sample_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n: int,
    salt: str | None = "stratum",
) -> DataFrame:
    """EXACT stratified sample: precisely ``min(n, |group|)`` rows per
    group, deterministically — the per-source cap every training-data
    mixture needs (``sampleBy`` is per-partition pseudo-random: only
    approximate fractions, and a repartition reshuffles the picks).

    Rows are ranked inside each group by the salted md5 of their key
    (uniform ⇒ a uniform without-replacement draw; content-keyed ⇒ the
    same rows win on every run, any partitioning, any engine) and the
    first ``n`` kept. Ties on the full 32-hex digest are broken by the
    key itself, and DUPLICATE keys (same key, different payload) by a
    64-bit hash of the full row — without that last term
    ``row_number`` would resolve equal-key rows by partition arrival
    order and the picks could differ across runs (r7 verdict "What's
    wrong #6"). So the ordering is total up to hash collision
    (2^-64, the digest-level trust the draw already places); exact
    duplicate rows — and rows differing only in an unhashable map
    column — remain interchangeable (either copy is the same
    answer).

    Scale shape: ONE keyed window (hash-partition + sort per group) —
    the operators/asof.py cost class, with the same hot-group caveat;
    rank-k selection never collects anything to the driver."""
    if n <= 0:
        raise ValueError("n must be positive")
    from pyspark.sql import Window

    s = F.col(key_col).cast("string")
    if salt is not None:
        s = F.concat(F.lit(f"{salt}:"), s)
    h = F.md5(s)
    # Duplicate-key tiebreak: a NARROW 64-bit hash of the full row,
    # not the row struct itself — a wide payload column in the window
    # ORDER BY would drag every byte through the sort buffers
    # (review-found). Names are backtick-quoted so dotted literal
    # names resolve (both F.col and df[...] parse dots as struct
    # access); map columns are excluded (xxhash64 can't hash them).
    # Rows differing only in a map column — or colliding at 2^-64 —
    # stay interchangeable, the same digest-level trust the primary
    # md5 draw already places.
    from sensorstream_scalable_sensor_data_pipeline_spark.functions.identifiers import (
        quote_ident,
    )

    hashable = [F.col(quote_ident(c)) for c, t in df.dtypes if "map<" not in t]
    order = [h.asc(), F.col(key_col).asc()]
    if hashable:
        order.append(F.xxhash64(F.struct(*hashable)).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def temperature_budgets(
    totals: dict[str, int], alpha: float, total_budget: int
) -> dict[str, int]:
    """Token budgets per stratum from a TEMPERATURE rather than a
    hand-written table: target share ∝ total_s^alpha (the multilingual
    / multi-source mixing rule — alpha=1 keeps natural proportions,
    alpha→0 flattens toward uniform, boosting small strata).

    Allocation is water-filling: a stratum cannot receive more tokens
    than it HAS, and the overflow re-distributes across the still-
    uncapped strata by the same weights, iterating until stable — so
    Σ budgets = min(total_budget, Σ totals) up to integer rounding,
    and no budget exceeds its stratum. Pure, deterministic driver
    math over mixture-sized dicts."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    live = {s: t for s, t in totals.items() if t > 0}
    budgets = {s: 0 for s in totals}
    remaining = min(int(total_budget), sum(live.values()))
    uncapped = set(live)
    while remaining > 0 and uncapped:
        w = {s: float(live[s]) ** alpha for s in uncapped}
        z = sum(w.values())
        # floor-allocate; give any rounding residue to the largest
        # weight so the loop always terminates
        alloc = {s: int(remaining * w[s] / z) for s in uncapped}
        residue = remaining - sum(alloc.values())
        if residue:
            top = max(uncapped, key=lambda s: (w[s], repr(s)))
            alloc[top] += residue
        progressed = False
        for s, a in alloc.items():
            room = live[s] - budgets[s]
            take = min(a, room)
            if take > 0:
                budgets[s] += take
                remaining -= take
                progressed = True
        uncapped = {s for s in uncapped if budgets[s] < live[s]}
        if not progressed:
            break
    return budgets


def sample_temperature_mixture(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    tokens_col: str,
    alpha: float,
    total_budget: int,
    salt: str | None = "mixture",
) -> tuple[DataFrame, dict[str, int], dict[str, int]]:
    """One-call temperature mixture: ONE per-stratum totals aggregate
    (passed through so :func:`sample_to_token_budget` does not re-scan
    — one pass over the corpus, not two), budgets from
    :func:`temperature_budgets`, sample. Returns (sampled frame,
    per-mille rates, derived budgets) — log the rates AND budgets with
    the run; both are the reproducibility artifact.

    NULL strata are EXCLUDED from the mixture (a row with no source
    label cannot be budgeted; it is dropped exactly like a stratum
    absent from a hand-written budget table) — feeding a None key
    into the rate table would break the deterministic filter."""
    totals = {
        r[strata_col]: int(r["_t"])
        for r in df.groupBy(strata_col)
        .agg(F.sum(F.col(tokens_col)).alias("_t"))
        .collect()
        if r[strata_col] is not None
    }
    budgets = temperature_budgets(totals, alpha, total_budget)
    out, rates = sample_to_token_budget(
        df, key_col, strata_col, tokens_col, budgets, salt=salt, totals=totals
    )
    return out, rates, budgets


def sample_per_group_weighted(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n: int,
    weight_col: str,
    salt: str | None = "wstratum",
) -> DataFrame:
    """EXACT weighted without-replacement sampling per group —
    :func:`sample_per_group` with per-row inclusion probability
    proportional to ``weight_col`` (quality scores, token counts):
    the Efraimidis-Spirakis A-Res scheme: each row keyed by
    ``ln(u)/w`` with u a DETERMINISTIC content-derived uniform, top-n
    per group by that key. Same reproducibility contract as every
    sampler here: re-runs, repartitions, and engines agree on the
    picks because u comes from the salted md5 of the key, not an RNG.

    Rows with weight ≤ 0 or NULL never win (key −∞ via a NULL sort
    last). u is quantized to ~2^53 buckets of the md5 space — ties
    are broken by the key column, so selection is total-ordered.
    One keyed window (sample_per_group's cost class)."""
    if n <= 0:
        raise ValueError("n must be positive")
    from pyspark.sql import Window

    s = F.col(key_col).cast("string")
    if salt is not None:
        s = F.concat(F.lit(f"{salt}:"), s)
    # uniform in (0, 1): 13 md5 hex digits = 52 bits, +0.5 keeps u>0
    u = (
        F.conv(F.substring(F.md5(s), 1, 13), 16, 10).cast("double") + 0.5
    ) / F.lit(float(1 << 52))
    w = F.col(weight_col).cast("double")
    es_key = F.when(w > 0, F.log(u) / w)  # larger is better (log u < 0)
    ranked = df.withColumn("_es", es_key).withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(
                F.col("_es").desc_nulls_last(), F.col(key_col).asc()
            )
        ),
    )
    return ranked.filter(
        F.col("_rk") <= n
    ).filter(F.col("_es").isNotNull()).drop("_es", "_rk")
