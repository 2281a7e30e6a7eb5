"""Deduplication operators for training-data pipelines, Spark-first.

* exact: hash-groupBy on sha2(content) — one shuffle on the 64-char digest.
* minhash + LSH: word-shingles -> H minhash values -> B bands -> candidate
  pairs join on (band, band-hash). All hashing is xxhash64 in Catalyst
  expressions (JVM, codegen); ONLY the band join shuffles, and it shuffles
  the short signature rows, never the documents. (Broder 1997 resemblance
  sketches; Leskovec/Rajaraman/Ullman MMDS ch.3 banding analysis.)
* simhash: 64-bit sign-of-weighted-sum fingerprint (Charikar 2002; used by
  Google for web dedup, Manku et al. WWW'07) — md5-derived term hashes so
  the construction is engine-portable, 60 bitwise aggregates in one pass.
* ngram-Jaccard: exact shingle-set Jaccard via an inverted shingle join —
  the verification step after LSH candidate generation.

Scale notes (100 TB): every operator here keys its shuffle on a short hash,
broadcasts nothing unbounded, and degrades gracefully under skew (shingle
join inherits AQE skew handling; identical-boilerplate shingles can be
df-capped like hot terms in build.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from excelastic_spark.functions.text import tokens_col


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical docs: (content_sha, n_dups, keeper_id).
    Keeper = min id (deterministic survivor policy)."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("content_sha"), F.col(id_col))
        .groupBy("content_sha")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct content (the min-id row)."""
    keep = exact_duplicate_groups(df, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def shingles_col(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams of the analyzer token stream, as a Catalyst
    expression (no UDF): slide a window over the token array."""
    toks = tokens_col(text)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1))),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signature(text: Column, num_hashes: int = 16, k: int = 3) -> Column:
    """H-element minhash signature: for seed j, min over shingles of
    xxhash64(j, shingle). xxhash64 with a distinct first column per seed is
    an independent-enough hash family for Jaccard sketching."""
    sh = shingles_col(text, k)
    mins = [
        F.array_min(F.transform(sh, lambda s, j=j: F.xxhash64(F.lit(j), s)))
        for j in range(num_hashes)
    ]
    return F.array(*mins)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b, n_shared_bands) via banding:
    docs agreeing on ALL rows of >=1 band become candidates. With H=16, B=4
    (r=4 rows/band) the S-curve threshold is ~ (1/4)^(1/4) ≈ 0.71 Jaccard."""
    rows = num_hashes // bands
    sig = df.select(
        F.col(id_col), minhash_signature(F.col(text_col), num_hashes, k).alias("sig")
    ).filter(F.size("sig") > 0)
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[b * rows + r] for r in range(rows)]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bd"),
    ).select(id_col, "bd.band", "bd.bhash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def simhash64(text: Column, tf_weighted: bool = True) -> Column:
    """Charikar simhash: per token, a 60-bit md5-derived hash votes ±tf on
    each bit position; fingerprint bit = sign of the vote sum. Pure
    aggregate expressions (the 60 per-bit sums fuse into one codegen'd
    projection + one aggregate)."""
    toks = tokens_col(text)
    # (token, tf) pairs without a shuffle: aggregate inside the array
    distinct = F.array_distinct(toks)
    tf = F.transform(
        distinct,
        lambda t: F.size(F.filter(toks, lambda x: x == t)),
    )
    h = F.transform(distinct, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))
    bits = []
    for i in range(60):
        vote = F.aggregate(
            F.zip_with(
                h,
                tf,
                lambda hv, tfv: F.when(
                    hv.bitwiseAND(F.lit(1 << i)) != 0, tfv
                ).otherwise(-tfv),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(vote > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for bcol in bits[1:]:
        out = out + bcol
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance. Candidate generation
    blocks on 16-bit bands of the fingerprint (Manku et al.: a pair within
    hamming d of a 64-bit print shares at least one of ceil(64/(d+1))-ish
    bands exactly); verification = exact popcount."""
    fp = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("fp"))
    bands = 4
    width = 15  # 60-bit fingerprint -> 4 bands of 15 bits
    banded = fp.select(
        id_col,
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("fp"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bd"),
    ).select(id_col, "fp", "bd.band", "bd.key")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming64(F.col("a.fp"), F.col("b.fp")).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT shingle-set Jaccard for every pair sharing >=1 shingle, via the
    inverted shingle index (shuffle keys are 64-bit shingle hashes, never
    text). Returns (id_a, id_b, inter, size_a, size_b, jaccard_e6) with
    jaccard >= threshold. This is the LSH verification step; identical SQL
    runs in DuckDB as the oracle."""
    sh = df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                shingles_col(F.col(text_col), k), lambda s: F.xxhash64(s)
            )
        ).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("size_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard_e6",
            F.floor(
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double")
                * 1e6
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    # single threshold on the rounded value so the SQL oracle (which has no
    # engine-side prefilter) selects the identical pair set
    return out.filter(F.col("jaccard_e6") >= int(threshold * 1e6)).select(
        "id_a", "id_b", "inter", "size_a", "size_b", "jaccard_e6"
    )
