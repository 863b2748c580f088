"""Near-duplicate detection family (SURVEY §2.12): MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design, common to all four:

* **Never all-pairs.** Candidate generation is always a *blocked*
  equi-join (LSH band buckets, simhash prefix blocks, metadata
  blocks) so the join key-space bounds the pair count; verification
  (exact Jaccard / hamming / cosine) runs only on candidates. At
  100 TB the candidate join is an ordinary keyed shuffle —
  AQE-skew-splittable — while an all-pairs cross join would be
  O(n²) and dead on arrival.
* **Deterministic hashing.** MinHash permutations are md5 over a
  seed-prefixed shingle; the *string* minimum is the signature
  element. String-domain minhash keeps every step expressible in
  both Spark and ANSI SQL (oracle-checkable) with zero UDFs.
* **Pure column expressions.** Shingling, signatures and banding are
  higher-order array functions inside whole-stage codegen; the only
  shuffles are the band-bucket join and the final distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.text import tokenize_lower

# Default MinHash geometry: 12 permutations in 4 bands of 3 — catches
# Jaccard ≳ 0.6 pairs with high probability while keeping signatures
# cheap. Tune per corpus: more bands → higher recall, more candidates.
NUM_PERMS = 12
NUM_BANDS = 4
ROWS_PER_BAND = NUM_PERMS // NUM_BANDS
SHINGLE_SIZE = 3


def shingles(text: Column, k: int = SHINGLE_SIZE) -> Column:
    """Word k-grams; documents shorter than k tokens collapse to one
    whole-text shingle."""
    toks = tokenize_lower(text)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.when(n >= k, grams).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signature(text: Column, num_perms: int = NUM_PERMS) -> Column:
    """MinHash signature: element s = min over shingles of
    md5('<s>:' + shingle). md5 is a fine permutation proxy and the
    lexicographic min over hex strings is engine-portable."""
    sh = shingles(text)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perms - 1)),
        lambda s: F.array_min(
            F.transform(sh, lambda x: F.md5(F.concat(s.cast("string"), F.lit(":"), x)))
        ),
    )


def lsh_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perms: int = NUM_PERMS,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """Explode each doc into (id, band, band_hash) bucket keys."""
    r = num_perms // num_bands
    sig = minhash_signature(F.col(text_col), num_perms)
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.md5(F.concat_ws("|", F.slice(sig, b * r + 1, r))).alias("band_hash"),
        ),
    )
    return df.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perms: int = NUM_PERMS,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.
    One keyed self-join on (band, band_hash) + distinct — no
    cross join anywhere."""
    b = lsh_bands(df, id_col, text_col, num_perms, num_bands)
    left = b.select(
        F.col("band"), F.col("band_hash"), F.col(id_col).alias("id_a")
    )
    right = b.select(
        F.col("band"), F.col("band_hash"), F.col(id_col).alias("id_b")
    )
    return (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Exact verification: token-set Jaccard for each candidate pair.
    ``pairs`` has (id_a, id_b); result adds ``jaccard``. Two broadcast-
    able dim joins pull the token sets in; the set algebra is
    array_intersect/array_union column math."""
    toks = docs.select(
        F.col(id_col), F.array_distinct(tokenize_lower(F.col(text_col))).alias("tokset")
    )
    out = (
        pairs.join(toks.withColumnRenamed(id_col, "id_a").withColumnRenamed("tokset", "ts_a"), "id_a")
        .join(toks.withColumnRenamed(id_col, "id_b").withColumnRenamed("tokset", "ts_b"), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("ts_a"), F.col("ts_b")))
    union = F.size(F.array_union(F.col("ts_a"), F.col("ts_b")))
    return out.select(
        "id_a", "id_b", (inter.cast("double") / union).alias("jaccard")
    )


# --------------------------------------------------------------- SimHash


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document from xxhash64 token hashes.

    explode(tokens) → per-(doc, bit) ±1 sums → sign vector → packed
    into a single long. One shuffle keyed by doc id (uniform). The
    column-expression form (64 conditional sums inside one hash
    aggregate, partial-aggregated map-side) keeps it entirely JVM-side;
    no oracle (DuckDB lacks xxhash64) — verified by property tests.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokenize_lower(F.col(text_col)))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    packed = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        packed = term if packed is None else packed.bitwiseOR(term)
    return bit_sums.select(F.col(id_col), packed.alias("simhash"))


def simhash_candidates(sh: DataFrame, id_col: str, prefix_bits: int = 16) -> DataFrame:
    """Block on the top ``prefix_bits`` of the simhash: near-identical
    docs almost always share the prefix; the self-join is keyed, never
    all-pairs. (Production systems rotate the 64 bits into 4 blocks —
    that refinement is a TODO documented here, same join shape.)"""
    blocked = sh.withColumn("block", F.shiftright(F.col("simhash"), 64 - prefix_bits))
    a = blocked.select(F.col("block"), F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = blocked.select(F.col("block"), F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    pairs = a.join(b, "block").filter(F.col("id_a") < F.col("id_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("id_a", "id_b", ham.alias("hamming"))
