"""Deduplication operators for training-data pipelines (extension surface).

Five dedup families, each picked for a different scale/recall trade-off:

- **exact**: hash-groupBy on the normalized text — one shuffle, the 100 TB
  default first pass;
- **n-gram Jaccard**: exact set-similarity via shingle explode + self-join —
  the *oracle-able* near-dup (the SQL equivalent is pure relational algebra);
- **MinHash + LSH banding**: shingle -> minhash signature -> band buckets ->
  candidate pairs — near-dup at scale; candidates are verified with exact
  Jaccard so precision is exact, recall is the LSH probability;
- **SimHash**: 64-bit token-weight fingerprint, near-dups = small Hamming
  distance; banded by 16-bit chunks for candidate generation;
- **embedding cosine**: near-dup on the embedding column (see
  :mod:`similarity` for the top-k variant).

All are pure DataFrame compositions — hashing uses Spark's built-in
``xxhash64`` (JVM, codegen) rather than Python UDFs. Pair outputs are
canonicalized as ``id_a < id_b``.

Scale notes: the shingle self-join explodes on frequent shingles, so
``ngram_jaccard_pairs`` caps shingle document-frequency (a standard stop-
shingle cut); MinHash/SimHash banding keeps the candidate join key-bounded
(band hash), which AQE handles well even under skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_warehouse_copy_spark.functions.text import whitespace_tokens


def exact_dedup(
    df: DataFrame, key_cols: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: keep the lowest-id row per duplicate group.

    ``row_number`` over a hash-partitioned window — one shuffle on the dup
    key; deterministic survivor choice (min id), unlike ``dropDuplicates``
    whose survivor is partition-order-dependent.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def word_shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of the lowercased text (strings, so the
    SQL oracle can build the identical set)."""
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    k = F.size(toks) - (n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k), lambda i: F.concat_ws(" ", F.slice(toks, i, n))
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join.

    shingle-explode -> equi-self-join on shingle -> per-pair intersection
    count -> Jaccard = inter / (|A| + |B| - inter). Returns
    ``(id_a, id_b, jaccard)`` with ``jaccard >= threshold``, ``id_a < id_b``.

    ``max_shingle_df`` drops shingles appearing in more than that many docs
    (stop-shingles) — at scale the join blowup is driven entirely by those
    heavy keys; dropping them only *underestimates* similarity slightly for
    docs made of boilerplate. None = exact (the oracle-matching setting).
    """
    shingled = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    )
    sizes = shingled.select("id", F.size("sh").alias("n_sh"))
    exploded = shingled.select("id", F.explode("sh").alias("s"))
    if max_shingle_df is not None:
        heavy = (
            exploded.groupBy("s")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("s")
        )
        exploded = exploded.join(heavy, on="s", how="left_anti")

    a, b = exploded.alias("a"), exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        # exact int arithmetic + one double division — bit-identical on any
        # engine, so no rounding needed for oracle comparison
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------------ MinHash

def minhash_signature(shingles: F.Column, num_hashes: int = 64) -> F.Column:
    """MinHash signature: ``min over shingles of h_i(s)`` for ``num_hashes``
    independent hash functions ``h_i(s) = xxhash64(s, seed=i)``.

    xxhash64 is JVM-side and vectorized; the whole signature is one
    projection, no shuffle.
    """
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, verified with exact Jaccard.

    signature -> split into ``bands`` bands of ``num_hashes/bands`` rows ->
    band-hash equi-join for candidates -> exact Jaccard on candidates ->
    filter by threshold. With 64 hashes / 16 bands (r=4) the LSH S-curve
    crosses ~50% at s≈0.5 and >99.6% at s=0.8 — right for a 0.8 threshold.

    Returns ``(id_a, id_b, jaccard)``; precision exact (verified), recall
    = LSH-probabilistic.
    """
    rows_per_band = num_hashes // bands
    shingled = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    ).filter(F.size("sh") > 0)
    sig = shingled.select(
        "id", "sh", minhash_signature(F.col("sh"), num_hashes).alias("sig")
    )
    banded = sig.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bidx).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[bidx * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bidx in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        candidates.withColumn(
            "jaccard", F.round(inter / union.cast("double"), 6)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------------ SimHash

def simhash64(text_col: str) -> F.Column:
    """64-bit SimHash over whitespace tokens: for each bit, sum +1/-1 token
    votes (token hashed with xxhash64) and keep the sign. Pure expression
    fold — no UDF."""
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_cols = []
    for bit in range(64):
        votes = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit_cols.append(
            F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
            * F.lit(2 ** bit).cast("long")
            if bit < 63
            # avoid 2**63 overflow: put the top bit in via shiftleft
            else F.shiftleft(
                F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0)), 63
            )
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def hamming64(a: F.Column, b: F.Column) -> F.Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: candidates share at least one of four 16-bit
    bands (any pair within Hamming distance 3 of a 64-bit key must agree on
    one band — pigeonhole), then exact Hamming filter."""
    sh = df.select(F.col(id_col).alias("id"), simhash64(text_col).alias("sim"))
    banded = sh.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("sim"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "sim", F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
