"""Deduplication operators for large-scale corpora.

Beyond the reference's key-exact dedup (`DISTINCT ON (id)`,
`mapping/data-loader.ts:46`; old-format dedupe
`dedupe-provision-mapping-jsons.ts:118-151`), these are the operators a
100 TB training-data pipeline needs: exact (hash-groupBy), MinHash+LSH
near-dup, SimHash, n-gram Jaccard pair scoring, and embedding-cosine
near-dup. All JVM-side column expressions except nothing — no Python in
any of them.

Scale notes: every near-dup variant is *blocked* (LSH bands / SimHash
prefix buckets) so candidate generation is an equi-join, never an O(n²)
cross join. Exact dedup keeps a deterministic winner (min key), never
"first seen" (partition-order traps, SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .linking import band_hashes, minhash_signature


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct word k-grams (JVM-side)."""
    words = F.split(F.trim(F.regexp_replace(col, r"\s+", " ")), " ")
    n = F.greatest(F.size(words) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        )
    )


def exact_dedup(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """Exact near-O(n) dedup: group by content hash, keep min-key winner.

    One shuffle on the 256-bit hash — uniformly distributed, no skew.
    """
    h = F.sha2(F.col(text_col), 256)
    w = Window.partitionBy("content_hash").orderBy(key_col)
    return (
        df.withColumn("content_hash", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_dup_pairs(
    df: DataFrame, key_col: str, text_col: str, jaccard_threshold: float = 0.7,
    shingle_words: int = 3,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs: shingle → minhash → band →
    bucket-join → exact Jaccard verify. Returns (key_a, key_b, jaccard).

    The band join is the only shuffle; verification joins shingle arrays
    back by key. Pairs are emitted once (key_a < key_b).
    """
    base = df.select(
        F.col(key_col).alias("_k"), word_shingles(F.col(text_col), shingle_words).alias("_sh")
    ).filter(F.size("_sh") > 0)
    banded = base.withColumn(
        "_bands", band_hashes(minhash_signature(F.col("_sh")))
    ).select("_k", "_sh", F.posexplode("_bands").alias("band_pos", "band_hash"))

    a = banded.select(
        F.col("_k").alias("key_a"), F.col("_sh").alias("_sha"), "band_pos", "band_hash"
    )
    b = banded.select(
        F.col("_k").alias("key_b"), F.col("_sh").alias("_shb"), "band_pos", "band_hash"
    )
    pairs = (
        a.join(b, ["band_pos", "band_hash"])
        .filter(F.col("key_a") < F.col("key_b"))
        .dropDuplicates(["key_a", "key_b"])
    )
    jac = F.size(F.array_intersect("_sha", "_shb")) / F.greatest(
        F.size(F.array_union("_sha", "_shb")), F.lit(1)
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("key_a", "key_b", "jaccard")
    )


def simhash(col: Column, bits: int = 64) -> Column:
    """64-bit SimHash of word tokens, pure column expressions.

    For each bit position, sum +1/-1 over token hashes; the sign vector is
    re-packed into a long. Implemented as aggregate over the token array.
    """
    tokens = F.split(F.trim(F.regexp_replace(col, r"\s+", " ")), " ")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    def bit_sum(i: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << i) if i < 63 else F.lit(-(2**63))) != 0, 1).otherwise(-1),
        )
    out = F.lit(0).cast("long")
    for i in range(bits):
        bit_val = F.lit(1 << i).cast("long") if i < 63 else F.lit(-(2**63)).cast("long")
        out = out + F.when(bit_sum(i) > 0, bit_val).otherwise(F.lit(0).cast("long"))
    return out


def simhash_dup_pairs(
    df: DataFrame, key_col: str, text_col: str, max_hamming: int = 3,
    n_tables: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: block on 16-bit bands of the 64-bit simhash
    (any pair within Hamming distance ≤ 3 shares at least one of 4 bands),
    then verify exact Hamming distance via bit_count(xor).
    """
    base = df.select(F.col(key_col).alias("_k"), simhash(F.col(text_col)).alias("_sim"))
    # 4 bands of 16 bits each
    banded = base.select(
        "_k", "_sim",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("_sim"), 16 * t).bitwiseAND(F.lit(0xFFFF))
                for t in range(n_tables)
            ])
        ).alias("band_pos", "band_val"),
    )
    a = banded.select(F.col("_k").alias("key_a"), F.col("_sim").alias("_sa"),
                      "band_pos", "band_val")
    b = banded.select(F.col("_k").alias("key_b"), F.col("_sim").alias("_sb"),
                      "band_pos", "band_val")
    pairs = (
        a.join(b, ["band_pos", "band_val"])
        .filter(F.col("key_a") < F.col("key_b"))
        .dropDuplicates(["key_a", "key_b"])
        .withColumn("hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("key_a", "key_b", "hamming")


def ngram_jaccard_pairs(
    df: DataFrame, key_col: str, text_col: str, threshold: float = 0.5,
    shingle_words: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard over an inverted-index join (no LSH, exact):
    explode shingles → self-join on shingle → count intersections →
    |A∩B| / (|A|+|B|−|A∩B|). The classic exact set-similarity-join plan.
    """
    base = df.select(
        F.col(key_col).alias("_k"), word_shingles(F.col(text_col), shingle_words).alias("_sh")
    ).filter(F.size("_sh") > 0)
    sizes = base.select("_k", F.size("_sh").alias("_n"))
    inv = base.select("_k", F.explode("_sh").alias("shingle"))
    a = inv.select(F.col("_k").alias("key_a"), "shingle")
    b = inv.select(F.col("_k").alias("key_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("_inter"))
    )
    sa = sizes.select(F.col("_k").alias("key_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("_k").alias("key_b"), F.col("_n").alias("_nb"))
    return (
        inter.join(sa, "key_a")
        .join(sb, "key_b")
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("key_a", "key_b", "jaccard")
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays — zip_with + aggregate, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / F.greatest(na * nb, F.lit(1e-12))


def embedding_dup_pairs(
    df: DataFrame, key_col: str, vec_col: str, threshold: float = 0.95,
    n_planes: int = 16,
) -> DataFrame:
    """Embedding-cosine near-dup with random-hyperplane (SRP) LSH blocking.

    Each vector gets a sign-bit sketch from n_planes deterministic
    pseudo-random hyperplanes (hash-derived, no RNG state); candidates
    share the full sketch bucket; cosine verifies. For higher recall,
    bucket on two half-sketches (any pair differing in < n_planes/2 bits
    shares one half).
    """
    dims = F.size(F.col(vec_col))
    # deterministic hyperplane component h(p, d) mapped to [-1, 1]
    def plane_dot(p: int) -> Column:
        return F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.transform(
                    F.sequence(F.lit(0), dims - 1),
                    lambda d: (F.pmod(F.xxhash64(F.lit(p), d), F.lit(2001)) - 1000)
                    / 1000.0,
                ),
                lambda v, r: v * r,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    sketch_bits = [F.when(plane_dot(p) >= 0, 1).otherwise(0) for p in range(n_planes)]
    half = n_planes // 2
    lo = F.concat_ws("", *[b.cast("string") for b in sketch_bits[:half]])
    hi = F.concat_ws("", *[b.cast("string") for b in sketch_bits[half:]])
    base = df.select(
        F.col(key_col).alias("_k"), F.col(vec_col).alias("_v"),
        lo.alias("_lo"), hi.alias("_hi"),
    )
    banded = base.select(
        "_k", "_v", F.posexplode(F.array("_lo", "_hi")).alias("band_pos", "band_val")
    )
    a = banded.select(F.col("_k").alias("key_a"), F.col("_v").alias("_va"),
                      "band_pos", "band_val")
    b = banded.select(F.col("_k").alias("key_b"), F.col("_v").alias("_vb"),
                      "band_pos", "band_val")
    return (
        a.join(b, ["band_pos", "band_val"])
        .filter(F.col("key_a") < F.col("key_b"))
        .dropDuplicates(["key_a", "key_b"])
        .withColumn("cosine", cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("key_a", "key_b", "cosine")
    )
