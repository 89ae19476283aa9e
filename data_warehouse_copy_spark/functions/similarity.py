"""Similarity search over embedding columns (extension surface).

The ``embeddings`` table carries ``array<float>`` vectors (dim 64 in the
fixtures). Two search paths:

- **brute-force cosine top-k** — the exact baseline: query-set × corpus
  join, cosine as a codegen'd ``zip_with``/``aggregate`` expression (no
  Python), ``row_number() <= k`` per query. Cost O(|Q|·|C|·d): right when
  |Q| is small or as the verification oracle.
- **random-hyperplane LSH (sign-bit) buckets** — the scale path: ``p``
  deterministic pseudo-random hyperplanes (seeded, derived from xxhash64 so
  every executor computes the same planes without broadcasting state), a
  vector's bucket is the sign-bit string; candidates share a bucket in at
  least one of ``bands`` bands; exact cosine re-ranks candidates. Sub-linear
  candidate generation, exact precision on what it returns; recall is the
  LSH probability (tested against brute force at sf0.001).

Cosine here is ``dot / (||a|| * ||b||)`` computed in float64 with a fixed
left-fold accumulation order, so the value is bit-identical to any engine
that folds the same way (the DuckDB oracle does) — no rounding needed. A zero-norm
vector yields NULL (excluded), matching SQL division semantics.
"""

from __future__ import annotations

import numpy as np
import pandas

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    a, b = _to_double(a), _to_double(b)
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector the k nearest corpus
    vectors (self-matches excluded). Deterministic tie-break on neighbor id.

    Plan shape: broadcast the (small) query side, one pass over the corpus,
    per-query-key window for the top-k — the corpus is never shuffled except
    by the window's partitioning on query id, which AQE sizes.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold, ``id_a < id_b`` — embedding-based
    near-duplicate detection. O(n²) exact form; for large corpora run it per
    LSH bucket instead (``lsh_bucket_near_dup_pairs``)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ----------------------------------------------------- sign-bit LSH buckets

def sign_bits_udf(dim: int, planes: int, seed: int = 42):
    """LSH signature as an Arrow-batched Pandas UDF: per batch one
    ``(batch, dim) @ (dim, planes)`` float64 matmul, sign bits packed into a
    long (``planes <= 62``).

    The hyperplanes are derived from a seeded RNG at plan-build time and
    shipped inside the UDF closure (a few KB) — every executor sees identical
    planes. A giant per-element codegen expression (planes × dim scalar
    terms) compiles slowly and evaluates per-row; the matmul is vectorized
    over the whole Arrow batch, which is also the right shape at 100 TB.
    """
    rng = np.random.default_rng(seed)
    plane_mat = rng.uniform(-1.0, 1.0, size=(dim, planes))
    weights = (1 << np.arange(planes)).astype(np.int64)

    @pandas_udf("long")
    def f(vecs: pandas.Series) -> pandas.Series:
        if len(vecs) == 0:
            return pandas.Series([], dtype="int64")
        mat = np.asarray(vecs.tolist(), dtype=np.float64)
        bits = (mat @ plane_mat) >= 0
        return pandas.Series(bits.astype(np.int64) @ weights)

    return f


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    planes: int = 12,
    bands: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates must share one of ``bands`` bands of
    ``planes/bands`` sign bits; exact cosine re-ranks the candidates.

    Plan shape at scale: corpus signatures are computed once in a single
    projection; the candidate join is an equi-join on (band, band_key) —
    shuffle-bounded, no O(n²) cross join.
    """
    bits_per_band = planes // bands
    mask = (1 << bits_per_band) - 1

    sig_fn = sign_bits_udf(dim, planes, seed)

    def banded(df: DataFrame, role: str) -> DataFrame:
        sig = df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"{role}_vec"),
            sig_fn(F.col(vec_col)).alias("sig"),
        )
        return sig.select(
            f"{role}_id",
            f"{role}_vec",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band"),
                            F.shiftright(F.col("sig"), i * bits_per_band)
                            .bitwiseAND(F.lit(mask))
                            .alias("band_key"),
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(
            f"{role}_id", f"{role}_vec",
            F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key"),
        )

    qb = banded(queries, "query")
    cb = banded(corpus, "neighbor")
    cand = (
        qb.join(cb, ["band", "band_key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine", cosine(F.col("query_vec"), F.col("neighbor_vec"))
    ).filter(F.col("cosine").isNotNull())
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
