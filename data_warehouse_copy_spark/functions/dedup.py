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

import threading

import numpy as np
import pandas

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from data_warehouse_copy_spark.functions.text import whitespace_tokens

# The persisted LSH sketches (see minhash_lsh_pairs / simhash_pairs) are
# rotated through this holder, bounding live storage to a couple of tiny
# sketches per function even when a driver runs the whole catalog through
# one session. Entries are keyed by (slot, session, input plan) — NOT by
# slot alone — so two interleaved evaluations over different inputs in one
# process keep their own cache instead of unpersisting each other's
# mid-consumption (correctness would survive via lineage; the re-run of
# the whole shingle/UDF pipeline would not be cheap). Re-invoking on the
# SAME input rotates that input's sketch; inputs beyond the per-slot cap
# evict oldest-first. Unpersist only drops cached blocks, never
# correctness (the lineage recomputes if re-read).
_LIVE_SKETCHES: dict[tuple, DataFrame] = {}
_SKETCHES_PER_SLOT = 2
_SKETCHES_GUARD = threading.Lock()


def _unpersist_quiet(df: DataFrame) -> None:
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass  # session may be gone; nothing to free


def _plan_key(df: DataFrame):
    """Identity of the input plan: Catalyst's semantic hash when reachable
    (classic JVM session), else the Python object id — good enough to keep
    distinct inputs in distinct slots."""
    try:
        return df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        return id(df)


def _persist_rotating(slot: str, df: DataFrame) -> DataFrame:
    key = (slot, id(df.sparkSession), _plan_key(df))
    evict: list[DataFrame] = []
    with _SKETCHES_GUARD:
        prev = _LIVE_SKETCHES.pop(key, None)
        if prev is not None:
            evict.append(prev)  # same input re-invoked: rotate its sketch
        same_slot = [k for k in _LIVE_SKETCHES if k[0] == slot]
        while len(same_slot) >= _SKETCHES_PER_SLOT:
            evict.append(_LIVE_SKETCHES.pop(same_slot.pop(0)))
        out = df.persist()
        _LIVE_SKETCHES[key] = out
    for old in evict:
        _unpersist_quiet(old)
    return out


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


def shingles_from_tokens(toks: F.Column, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles from an already-materialized token
    array column. Keep tokenization in a separate projection: inlining it
    here would re-split the text once per gram index (no common-subexpression
    elimination inside lambda bodies) — O(tokens²) per document."""
    k = F.size(toks) - (n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k), lambda i: F.concat_ws(" ", F.slice(toks, i, n))
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def word_shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of the lowercased text (strings, so the
    SQL oracle can build the identical set). Prefer :func:`shingles_from_tokens`
    over a materialized token column in hot paths."""
    return shingles_from_tokens(whitespace_tokens(F.lower(F.col(text_col))), n)


def _shingle_udf(n: int):
    """Arrow-batched shingling: semantics identical to the expression form
    (trim → lower → split on Java-regex ``\\s+`` → n-gram join → distinct,
    first-occurrence order) but ~20× faster than interpreted higher-order
    functions. Java/RE2 ``\\s`` is ASCII-only, so the regex is spelled out —
    Python's ``\\s`` would also split on unicode spaces and break oracle
    parity.
    """
    import re

    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @pandas_udf("array<string>")
    def f(texts: pandas.Series) -> pandas.Series:
        out = []
        for t in texts:
            # SQL trim() strips spaces only; Java split() drops trailing
            # empty strings (Python keeps them) — both mirrored exactly.
            t = (t or "").strip(" ").lower()
            toks = java_ws.split(t) if t else []
            while toks and toks[-1] == "":
                toks.pop()
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            out.append(list(dict.fromkeys(grams)))
        return pandas.Series(out)

    return f


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, sh) with shingling vectorized per Arrow batch."""
    return df.select(
        F.col(id_col).alias("id"), _shingle_udf(n)(F.col(text_col)).alias("sh")
    )


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
    shingled = _shingled(df, id_col, text_col, n)
    # Carry the (uncapped) shingle-set size through the explode: no separate
    # sizes join, and the two sides of the self-join become identical
    # subplans so Spark reuses one shuffle exchange for both.
    exploded = shingled.select(
        "id", F.size("sh").alias("n_sh"), F.explode("sh").alias("s")
    )
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
        .agg(
            F.count("*").alias("inter"),
            F.min("a.n_sh").alias("n_a"),
            F.min("b.n_sh").alias("n_b"),
        )
    )
    return (
        # exact int arithmetic + one double division — bit-identical on any
        # engine, so no rounding needed for oracle comparison
        inter.withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------------ MinHash

def minhash_signature_udf(num_hashes: int = 64, seed: int = 42):
    """MinHash signature over pre-hashed shingles: classic one-base-hash +
    ``num_hashes`` linear permutations ``h_i(x) = a_i*x + b_i (mod 2^64)``,
    vectorized with numpy per Arrow batch.

    The base hash (xxhash64 per shingle) stays JVM-side — the caller passes
    ``transform(sh, s -> xxhash64(s))``; this UDF only does the per-row
    ``(num_hashes, |sh|)`` broadcast-multiply + min, which is exactly the
    shape numpy is fastest at and which interpreted Catalyst higher-order
    functions evaluate ~50× slower.
    """
    rng = np.random.default_rng(seed)
    a = (rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)

    @pandas_udf("array<bigint>")
    def f(hashes: pandas.Series) -> pandas.Series:
        out = []
        with np.errstate(over="ignore"):
            for h in hashes:
                x = np.asarray(h, dtype=np.int64).view(np.uint64)
                if x.size == 0:
                    out.append([])
                    continue
                sig = (a[:, None] * x[None, :] + b[:, None]).min(axis=1)
                out.append(sig.view(np.int64).tolist())
        return pandas.Series(out)

    return f


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
    shingled = _shingled(df, id_col, text_col, n).filter(F.size("sh") > 0)
    # Banded rows carry ONLY (id, band, bucket) — 24 bytes — through the
    # bands-times-exploded shuffle. Shipping the shingle arrays here would
    # multiply the shuffle by bands × |sh| (hundreds of MB at sf0.1); instead
    # the candidate pairs (few) join the arrays back by id afterwards.
    sig_fn = minhash_signature_udf(num_hashes)
    sig = _persist_rotating(
        "minhash_sig",
        shingled.select(
            "id",
            sig_fn(F.transform(F.col("sh"), lambda s: F.xxhash64(s))).alias("sig"),
        ),
    )
    # ^ The sketch is |docs| x num_hashes longs — KBs per million docs —
    # while its lineage (scan -> shingle -> hash -> numpy min-hash UDF) is
    # the expensive part. The plan consumes it from BOTH sides of the
    # band self-join, and without the persist Catalyst re-executes the
    # whole UDF pipeline per branch (observed: 14 ArrowEvalPython nodes).
    # Persisting the sketch, never the corpus, is also the 100 TB shape;
    # the rotating holder bounds live cache to one sketch per function.
    banded = sig.select(
        "id",
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
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = shingled.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = shingled.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = candidates.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        verified.withColumn("jaccard", inter / union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------------ SimHash

def _simhash_votes_udf():
    """(array of token xxhash64 values) -> packed 64-bit SimHash, numpy per
    Arrow batch: bit matrix via broadcast shift, +1/-1 votes summed over
    tokens, sign bits packed. The interpreted HOF fold did 64 ops per token
    per row in the expression evaluator — ~10× slower."""
    shifts = np.arange(64, dtype=np.uint64)
    weights = (np.uint64(1) << shifts).view(np.int64)

    @pandas_udf("long")
    def f(hashes: pandas.Series) -> pandas.Series:
        out = np.zeros(len(hashes), dtype=np.int64)
        for i, h in enumerate(hashes):
            x = np.asarray(h, dtype=np.int64).view(np.uint64)
            if x.size == 0:
                continue
            bits = ((x[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = weights[votes > 0].sum()  # int64 wrap packs bit 63
        return pandas.Series(out)

    return f


def simhash64(text_col: str) -> F.Column:
    """64-bit SimHash over whitespace tokens: for each bit, sum +1/-1 token
    votes (token hashed JVM-side with xxhash64) and keep the sign. Token
    hashing stays in Spark; the 64-bit vote/pack loop is a vectorized
    Arrow-batched UDF (:func:`_simhash_votes_udf`)."""
    toks_sql = (
        f"CASE WHEN trim({text_col}) = '' THEN array() "
        f"ELSE split(trim(lower({text_col})), '\\\\s+') END"
    )
    hashes = F.expr(f"transform({toks_sql}, t -> xxhash64(t))")
    return _simhash_votes_udf()(hashes)


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
    # Persist the sketch (id + one long per doc): both self-join sides read
    # it from cache instead of re-running the tokenize/vote UDF pipeline
    # per branch (same rationale + rotation as minhash_lsh_pairs' sig).
    sh = _persist_rotating(
        "simhash",
        df.select(F.col(id_col).alias("id"), simhash64(text_col).alias("sim")),
    )
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


def connected_components(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 50
) -> DataFrame:
    """Connected components over a pair list by min-label propagation:
    every node starts labeled with its own id; each round, labels flow
    across edges and each node keeps the minimum seen; fixpoint = each
    component labeled by its smallest member id. Returns ``(id, comp)``
    for every node that appears in a pair.

    This is the step that turns pairwise near-dup MATCHES (minhash/
    simhash/jaccard joins emit pairs) into dedup CLUSTERS, so a pipeline
    can keep exactly one survivor per transitive group — A~B, B~C must
    collapse to one cluster even when A~C was never emitted.

    Scale shape: each round is one equi-join + one min-aggregate (two
    shuffles on node id); rounds needed = graph diameter, and near-dup
    graphs are overwhelmingly tiny cliques (diameter 1-2), so 3-4 rounds
    close real corpora. ``localCheckpoint`` truncates the growing lineage
    each round — without it the plan doubles per iteration. The classic
    large-star/small-star variant (Kiveris et al., public) drops the round
    count for adversarially long chains; min-label is the right default.
    """
    e = pairs.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    edges = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    # Seed each label with min(self, direct neighbors) — one aggregate
    # instead of a starting labels=self round. For the dominant case
    # (diameter-1 cliques) this IS the fixpoint, so the loop below runs
    # exactly one confirming round instead of propagate + confirm.
    labels = edges.groupBy("a").agg(F.min("b").alias("nb")).select(
        F.col("a").alias("id"), F.least("a", "nb").alias("comp")
    )
    for _ in range(max_iter):
        msgs = edges.join(labels, edges["a"] == labels["id"]).select(
            F.col("b").alias("id"), F.col("comp")
        )
        new_labels = (
            labels.union(msgs).groupBy("id").agg(F.min("comp").alias("comp"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
