"""Training-data deduplication suite over the `documents` table.

Beyond the reference's exact-key dedup (P10, `UNIQUE(name)` / seen-set
skips), a 100 TB corpus pipeline needs content dedup.  All hot paths are
built-in functions (codegen'd); nothing collects to the driver.

Scale notes (10^12 docs):
* exact: one shuffle on a 128-bit content hash — perfectly balanced keys.
* MinHash-LSH: cost is O(docs × K) map-side + a shuffle on band hashes;
  candidate verification touches only colliding pairs.  Band count / rows
  per band tune the recall/cost curve.
* SimHash: one pass building a 64-bit signature (map-side), pairs via
  banded prefix blocking + popcount(XOR) <= k verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicates(docs: DataFrame, key: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    keeper (min key) and the duplicate count."""
    return (
        docs.select(F.col(key), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(key).alias("keeper"),
            F.count("*").cast("long").alias("n_copies"),
        )
    )


def word_ngram_shingles(
    docs: DataFrame, key: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """→ (key, shingle) distinct word n-grams, built natively:
    split → sequence → slice → array_join."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(F.col(key), F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing >=1 shingle.

    This is the *oracle-checkable* exact path; at corpus scale prefer
    :func:`minhash_near_duplicates` (LSH prunes the pair space).  Pairs
    sharing no shingle never materialize — the join on shingle is the
    blocker.
    """
    sh = word_ngram_shingles(docs, key, text_col, n)
    sizes = sh.groupBy(key).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(key).alias("id_a"), "shingle")
    b = sh.select(F.col(key).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(key).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(key).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_near_duplicates(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH near-dup detection (shingle → minhash → band →
    bucket-join → exact-Jaccard verify)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sh = word_ngram_shingles(docs, key, text_col, n)
    sig = sh.groupBy(key).agg(
        *[
            F.min(F.xxhash64(F.col("shingle"), F.lit(seed))).alias(f"h{seed}")
            for seed in range(num_hashes)
        ]
    )
    band_arr = F.array(
        *[
            F.xxhash64(
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
                F.lit(b),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(F.col(key), F.posexplode(band_arr).alias("band_id", "band_hash"))
    a = banded.select(F.col(key).alias("id_a"), "band_id", "band_hash")
    b = banded.select(F.col(key).alias("id_b"), "band_id", "band_hash")
    cand = (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # verify candidates with exact jaccard
    sizes = sh.groupBy(key).agg(F.count("*").alias("sz"))
    sh_a = sh.select(F.col(key).alias("id_a"), "shingle")
    sh_b = sh.select(F.col(key).alias("idb2"), F.col("shingle").alias("shingle_b"))
    inter = (
        cand.join(sh_a, "id_a")
        .join(
            sh_b,
            (F.col("id_b") == F.col("idb2")) & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(key).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(key).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(
    docs: DataFrame, key: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens, fully native: explode tokens,
    per-bit +/-1 vote, sign → bit.  One wide aggregation, map-side
    combinable."""
    tok = docs.where(F.col(text_col).isNotNull()).select(
        F.col(key), F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    h = F.xxhash64("tok")
    votes = tok.groupBy(key).agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << i).cast("long") if i < 63 else F.when(
            F.col("b63") > 0, F.lit(-(1 << 63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return votes.select(F.col(key), sig.alias("simhash"))


def simhash_near_duplicates(
    docs: DataFrame, key: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= k via 4x16-bit band blocking
    (any pair within Hamming 3 shares at least one exact 16-bit quarter)."""
    sig = simhash_signatures(docs, key, text_col)
    quarters = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), 16 * q)
            .bitwiseAND(F.lit(0xFFFF))
            .alias(f"q{q}")
            for q in range(4)
        ]
    )
    banded = sig.select(
        F.col(key), F.col("simhash"), F.posexplode(quarters).alias("band_id", "band_val")
    )
    a = banded.select(F.col(key).alias("id_a"), F.col("simhash").alias("sig_a"), "band_id", "band_val")
    b = banded.select(F.col(key).alias("id_b"), F.col("simhash").alias("sig_b"), "band_id", "band_val")
    return (
        a.join(b, ["band_id", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
