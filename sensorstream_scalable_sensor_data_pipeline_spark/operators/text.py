"""Text-analysis column operators (SURVEY §2.12: language-ID, quality
scoring, token counting, fingerprinting).

Everything here is a pure Catalyst column expression — regex splits
and higher-order array functions (``filter``/``transform``/
``aggregate``), no Python UDFs — so the operators run inside
whole-stage codegen at scan speed with zero shuffles. This is the
fast path for per-document scoring over a 100 TB corpus; anything
model-based (real langid, perplexity filters) would slot in as an
Arrow-batched Pandas UDF downstream of these cheap gates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword anchors for the heuristic langid. Order
#: matters only for documentation; tie-breaks are by language code.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "es": ["el", "la", "de", "que", "es"],
    "fr": ["le", "la", "et", "les", "est"],
}

QUALITY_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "you", "that"]

CJK_RANGE = "[一-鿿]"


def _strip_ws(c: Column) -> Column:
    """Leading/trailing-whitespace strip via regexp.

    Deliberately NOT ``F.trim``: in Spark 4.1 an expression chain that
    composes ``lower`` and ``trim`` falls off the fast path (collation-
    aware trim; measured 20-30 s for 500 rows vs 0.3 s for the regexp
    form). Semantics are identical for whitespace trimming.
    """
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def tokenize(text: Column) -> Column:
    """Whitespace tokenizer: trim + split on runs of whitespace."""
    return F.split(_strip_ws(text), r"\s+")


def tokenize_lower(text: Column) -> Column:
    """Lowercased whitespace tokens.

    Lowering per-token AFTER the split (``transform(split, lower)``)
    rather than lowering the whole string first: composing ``lower``
    under ``regexp_replace``/``split`` hits Spark 4.1's collation-aware
    slow path (measured 3.0 s vs 0.5 s for 500 docs). Identical
    result — lowercasing never creates or removes whitespace.
    """
    return F.transform(F.split(_strip_ws(text), r"\s+"), F.lower)


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


#: BPE-ish pre-tokenizer: the GPT-2-style split into letter runs,
#: digit runs, and single punctuation marks. Plain ASCII classes so
#: Java regex (Spark) and RE2 (DuckDB) agree exactly; the driver
#: corpus is pure ASCII (verified in plans/multimodal.py).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
#: Average subword length for the piece→token estimate (the common
#: ~4-chars-per-token rule of thumb for BPE vocabularies).
_SUBWORD_CHARS = 4.0


def bpe_ish_pieces(text: Column) -> Column:
    """Pre-tokenizer pieces (letter runs / digit runs / punctuation):
    what a BPE tokenizer would merge within — the regex-only stand-in
    for real subword tokenization the task allows."""
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)


def subword_count_estimate(pieces: Column) -> Column:
    """LLM-token count estimate: each piece contributes
    ``max(1, ceil(len/4))`` subwords — long words split, punctuation
    counts once. Codegen transform + aggregate over the staged piece
    array; exact integer math so both engines agree."""
    per_piece = F.transform(
        pieces,
        lambda p: F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.length(p) / F.lit(_SUBWORD_CHARS)).cast("long"),
        ),
    )
    return F.aggregate(per_piece, F.lit(0).cast("long"), lambda acc, v: acc + v)


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher-style quality gates as column math: token count,
    stopword ratio, mean token length, and a combined boolean gate."""
    toks = tokenize_lower(F.col(text_col))
    df = df.withColumn("_toks", toks)
    n = F.size(F.col("_toks"))
    stop_ratio = _stopword_hits(F.col("_toks"), QUALITY_STOPWORDS).cast("double") / n
    mean_len = F.length(F.concat_ws("", F.col("_toks"))).cast("double") / n
    return (
        df.withColumn("n_tokens", n)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("mean_token_len", mean_len)
        .withColumn(
            "quality_ok",
            F.when(
                (F.col("n_tokens") >= 10)
                & (F.col("stopword_ratio") >= 0.05)
                & (F.col("mean_token_len").between(2, 12)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .drop("_toks")
    )


def language_id(text: Column) -> Column:
    """Heuristic langid: CJK codepoint presence → zh; otherwise argmax
    of per-language stopword hits with a deterministic tie-break
    (highest language code wins, mirroring struct-max ordering)."""
    toks = tokenize_lower(text)
    scored = F.array(
        *[
            F.struct(
                _stopword_hits(toks, words).alias("hits"), F.lit(lang).alias("lang")
            )
            for lang, words in STOPWORDS.items()
        ]
    )
    best = F.array_max(scored)  # struct ordering: (hits, lang) lexicographic
    return F.when(text.rlike(CJK_RANGE), F.lit("zh")).otherwise(best["lang"])


#: Rabin-Karp rolling-hash parameters: base and a Mersenne-prime
#: modulus. acc < P < 2^31 and token hashes < 2^28, so every
#: acc·B + h step stays far below 2^63 — exact integer math in both
#: engines.
ROLLING_BASE = 1_000_003
ROLLING_MOD = 2_147_483_647


def rolling_hash(toks: Column) -> Column:
    """Polynomial (Rabin-Karp) rolling hash over a token array:
    ``h = fold(h·B + md5_28(tok) mod P)``. ORDER-SENSITIVE — unlike
    the min-token MinHash, reordering tokens changes the value, which
    is what makes it a sequence fingerprint rather than a set sketch.
    ``toks`` must be a materialized attribute (stage the tokenizer
    first — module docstring cliffs). DuckDB twin: ``list_reduce``
    starts its fold at the first element, which equals this init-0
    fold since ``0·B + h₁ = h₁``."""
    hashed = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long"),
    )
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(ROLLING_BASE) + h) % F.lit(ROLLING_MOD),
    )


def doc_fingerprint(text: Column) -> Column:
    """Content fingerprints: md5 of whitespace-normalized lowercase
    text (exact-dup key) + min token md5 (a 1-permutation MinHash —
    the primitive operators/dedup_fuzzy.py generalizes to k perms)."""
    norm = F.regexp_replace(F.regexp_replace(F.lower(text), r"\s+", " "), r"^ | $", "")
    toks = tokenize_lower(text)
    return F.struct(
        F.md5(norm).alias("norm_md5"),
        F.array_min(F.transform(toks, F.md5)).alias("min_token_md5"),
    )


#: µ-grid for cross-engine-stable log-prob summation (the
#: plans/text.py unigram discipline).
_LP_GRID = 1_000_000.0


def contrastive_logprob_score(
    docs: DataFrame,
    target_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-3/Pile-style importance-weight quality filter: score every
    candidate document by the mean per-token log-likelihood RATIO

        llr(doc) = mean_t [ ln P_target(t) − ln P_background(t) ]

    where P_target is the Laplace-smoothed unigram model trained on a
    curated ``target_docs`` corpus (the "wiki-like" positive class)
    and P_background the model of the candidate corpus itself.
    Positive scores mean "looks more like the target corpus than like
    the average candidate" — the classifier-free form of the GPT-3
    quality-filter idea (a contrast of two LMs), one rung above
    :func:`plans.text.unigram_logprob_score`'s single-model tier.
    Returns (id_col, llr, n_tokens).

    Both models smooth over the UNION vocabulary (standard for a
    likelihood ratio: the two distributions must share a support, or
    out-of-target tokens would be incomparable across documents);
    target-unseen tokens get the Laplace floor 1/(N_target+V), so
    rare/garbage tokens drag the ratio down exactly as intended.

    Plan shape: two explode + map-side-combined count aggregates (one
    per corpus), three scalars to the driver (N_target, N_background,
    |V∪|), then ONE pass over candidate tokens joining both vocab
    tables (broadcast while they fit; at web scale ordinary keyed
    shuffles, AQE-skew-splittable on stopwords) → per-doc aggregate.
    Per-token ratio values floor onto the 1e-6 grid and sum as
    BIGINTs, so the mean is partition-order independent and the
    DuckDB twin replays it to the grid step (ln differs in libm's
    last ulp across engines — tests compare at 2e-6, token counts
    exactly). Zero UDFs."""
    staged = docs.select(
        F.col(id_col), tokenize_lower(F.col(text_col)).alias("_tk")
    )
    toks = staged.select(id_col, F.explode("_tk").alias("token"))
    bg_vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_b"))
    t_toks = target_docs.select(
        tokenize_lower(F.col(text_col)).alias("_tk")
    ).select(F.explode("_tk").alias("token"))
    t_vocab = t_toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_t"))

    # ONE vocab frame (full outer on token), materialized once: the
    # three scalars come out of one aggregate job and the scoring join
    # reuses the same materialization — the naive form re-executed the
    # corpus explodes ~3× each (review-found; the sibling
    # unigram_logprob_score's one-collect discipline).
    both = bg_vocab.join(t_vocab, "token", "full_outer").localCheckpoint(
        eager=True
    )
    tot = both.agg(
        F.sum("n_b").alias("nb"),
        F.sum("n_t").alias("nt"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    n_bg = int(tot["nb"] or 0)
    n_tg = int(tot["nt"] or 0)
    if n_bg == 0 or n_tg == 0:
        raise ValueError("both corpora must contain at least one token")
    v_union = int(tot["v"])

    # corpus tokens always carry n_b (their own vocab), and target-only
    # tokens never join back to toks — the inner join is exact
    joined = toks.join(F.broadcast(both), "token")
    lp_t = F.log(
        (F.coalesce(F.col("n_t"), F.lit(0)) + 1).cast("double")
        / F.lit(float(n_tg + v_union))
    )
    lp_b = F.log(
        (F.col("n_b") + 1).cast("double") / F.lit(float(n_bg + v_union))
    )
    g = F.floor((lp_t - lp_b) * F.lit(_LP_GRID)).cast("long")
    return joined.select(id_col, g.alias("_g")).groupBy(id_col).agg(
        (
            (F.sum("_g").cast("double") / F.lit(_LP_GRID)) / F.count(F.lit(1))
        ).alias("llr"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
