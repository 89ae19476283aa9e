"""Text analysis operators for training-data pipelines.

Not in the reference (it has no scalar function surface at all — SURVEY.md
§2.1); mandated by the extension surface. Everything here is built from
JVM-side ``pyspark.sql.functions`` (whole-stage codegen, no Python in the
hot path) and each operator has exactly-matching ANSI-SQL semantics so the
DuckDB oracle can verify it value-for-value:

- token counting: whitespace tokens and a BPE-ish regex pre-tokenizer,
- quality scoring: length / punctuation / digit / stopword ratios folded
  into one deterministic [0,1] score,
- language ID: marker-stopword-hit scoring over a small language table
  (pure n-gram/stopword heuristic — no model, no network),
- document fingerprinting: polynomial rolling hash over codepoints
  (Karp-Rabin style), plus a length-bucketed near-dup prefilter key.

At 100 TB all of these are embarrassingly parallel single-pass projections:
no shuffle, fully pushed into the scan stage. Two deliberate exceptions to
"no Python", both Arrow-vectorized kernels pinned bit-exact against their
kept pure-expression references (HOF lambdas are CodegenFallback —
interpreted, no CSE): the streaming bigram mode (`_top_bigram_frac_vec`,
round-14, 5× the fold) and the Karp-Rabin fingerprint (`_rolling_fp_vec`,
round-15, 21× the per-character fold at realistic ~5 KB documents).
"""

from __future__ import annotations

import numpy as np
import pandas

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

# Small curated marker-word lists (public common stopwords). Keep them SHORT
# and frozen: they are part of the operator's contract with the SQL oracle.
STOPWORDS_EN = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "for", "on", "with", "as", "at", "by", "it", "this", "that",
)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr": ("le", "la", "les", "et", "est", "une", "pour", "dans", "que", "vous"),
    "es": ("el", "la", "los", "y", "es", "una", "para", "en", "que", "por"),
}

# modulus/base of the rolling hash — fits in int64 at every fold step:
# acc < 1e9+7, acc*31 + codepoint < 3.3e10 << 2^63.
FP_MOD = 1_000_000_007
FP_BASE = 31


def whitespace_tokens(text: Column) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array (a bare
    ``split`` would yield ``[""]``)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: Column) -> Column:
    """Whitespace token count (the cheap token estimator)."""
    return F.size(whitespace_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish pre-tokenizer count: runs of letters, runs of digits, or a
    single non-alphanumeric non-space char — the classic GPT-2-style
    pre-tokenization shape, expressible as one regex scan on both engines."""
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), F.lit(0))
    )


def stopword_count(text: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = whitespace_tokens(F.lower(text))
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def _strip_regex_count(text: Column, char_class: str) -> Column:
    """#chars matching char_class = len(text) - len(text with them removed)."""
    return F.length(text) - F.length(F.regexp_replace(text, char_class, ""))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Single-pass projection adding the quality-signal columns.

    All ratios are over ``n_chars`` / ``n_tokens`` with divide-by-zero
    guarded to 0.0; ``quality_score`` is a deterministic fold of the signals
    (higher = cleaner prose), rounded to 6 decimals for cross-engine
    comparability.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = token_count(text)
    punct = _strip_regex_count(text, r"[^A-Za-z0-9\s]")
    digits = _strip_regex_count(text, r"[0-9]")
    spaces = _strip_regex_count(text, r"\s")
    alpha = n_chars - punct - digits - spaces
    sw = stopword_count(text)

    safe_chars = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    safe_toks = F.when(n_tokens > 0, n_tokens.cast("double")).otherwise(F.lit(1.0))

    punct_ratio = F.round(punct / safe_chars, 6)
    digit_ratio = F.round(digits / safe_chars, 6)
    alpha_ratio = F.round(alpha / safe_chars, 6)
    stop_ratio = F.round(sw / safe_toks, 6)
    mean_tok_len = F.round(
        F.when(n_tokens > 0, (n_chars - spaces).cast("double") / safe_toks).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    # quality: alpha-heavy, some stopwords (real prose), sane token length,
    # low digit/punct noise, not too short. All terms in [0,1].
    # + 0.0 normalizes IEEE -0.0 (possible when alpha_ratio < 0 on non-Latin
    # text) to +0.0 so cross-engine hashes agree
    quality = F.round(
        alpha_ratio
        * (1.0 - digit_ratio)
        * (1.0 - punct_ratio)
        * F.least(stop_ratio * 4.0, F.lit(1.0))
        * F.least(n_tokens.cast("double") / 20.0, F.lit(1.0)),
        6,
    ) + F.lit(0.0)

    return df.select(
        "*",
        n_chars.alias("stat_n_chars"),
        n_tokens.alias("n_tokens"),
        bpe_ish_token_count(text).alias("n_bpe_tokens"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_tok_len.alias("mean_token_len"),
        quality.alias("quality_score"),
    )


def language_scores_array(text: Column) -> Column:
    """Marker-hit counts for ALL languages (sorted code order) in ONE pass:
    tokenize once, fold over the tokens accumulating an int array of per-
    language hits. One fold instead of one filter-lambda per language —
    higher-order lambdas are excluded from codegen subexpression
    elimination, so the per-language form re-tokenized the text for every
    score reference (measured ~7× slower inside a pushed-down filter)."""
    langs = sorted(LANG_MARKERS)
    marker_arrs = [
        F.array(*[F.lit(m) for m in LANG_MARKERS[lang]]) for lang in langs
    ]
    toks = whitespace_tokens(F.lower(text))
    zero = F.array(*[F.lit(0) for _ in langs])
    # NULL text tokenizes to a NULL array and the fold returns NULL —
    # normalize to all-zero scores so downstream argmax yields 'und'
    # (matching empty text) instead of silently electing a language.
    return F.coalesce(
        F.aggregate(
            toks,
            zero,
            lambda acc, t: F.array(
                *[
                    acc[i] + F.array_contains(marker_arrs[i], t).cast("int")
                    for i in range(len(langs))
                ]
            ),
        ),
        zero,
    )


def language_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language over lowercased whitespace tokens.

    Each entry is an INDEPENDENT single-language filter-count — right when
    a caller needs one or two scores. Do NOT build this from
    ``language_scores_array``: higher-order lambdas are excluded from
    codegen subexpression elimination, so ``arr[i]`` per language would
    re-run the full all-languages fold |langs| times. Consumers that need
    every score (``with_language_id``) materialize the array column once
    instead."""
    toks = whitespace_tokens(F.lower(text))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        # coalesce: NULL text -> 0 hits, same contract as the array form
        out[lang] = F.coalesce(
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t))),
            F.lit(0),
        )
    return out


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker hits, ties broken by language
    code ascending, zero hits -> 'und' (undetermined). Deterministic and
    SQL-expressible (a greatest-of-N + CASE chain in the oracle).

    Plan shape: the score array is materialized as an intermediate column
    (one fold), and lang_pred is an argmax over array<struct(score,-idx)>
    so each score is referenced exactly once — keeping the expression cheap
    enough that filter pushdown duplicating it is harmless. CollapseProject
    will not inline the fold into the consumers (it is multi-referenced and
    not cheap), so it is computed once per row."""
    langs = sorted(LANG_MARKERS)
    df2 = df.withColumn("_lang_scores", language_scores_array(F.col(text_col)))
    sc = [F.col("_lang_scores")[i] for i in range(len(langs))]
    # max over (score, -index): highest score wins, earliest lang on ties
    best = F.array_max(
        F.array(
            *[
                F.struct(sc[i].alias("s"), F.lit(-i).alias("r"))
                for i in range(len(langs))
            ]
        )
    )
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    # Guard on the score VALUE including null: a null best-score (possible
    # only if the scores array is null-backed upstream) must yield 'und',
    # not index 0's language — array_max tie-breaks on the struct's second
    # field when every first field is null, so the r=0 entry would win and
    # elect langs[0] for NULL text.
    pred = F.when(
        best["s"].isNull() | (best["s"] == 0), F.lit("und")
    ).otherwise(F.element_at(lang_arr, -best["r"] + 1))
    cols = (
        [df[c] for c in df.columns]
        + [pred.alias("lang_pred")]
        + [sc[i].alias(f"score_{langs[i]}") for i in range(len(langs))]
    )
    return df2.select(*cols)


def rolling_fingerprint_fold(text: Column) -> Column:
    """Polynomial rolling hash over unicode codepoints:
    ``fold(0, c -> (acc*31 + codepoint(c)) % 1_000_000_007)``.

    A classic Karp-Rabin document fingerprint — order-sensitive (unlike a
    bag-of-words hash) and exactly reproducible in ANSI SQL (DuckDB
    ``list_reduce``). Pure-expression form, kept as the PINNED SEMANTIC
    REFERENCE for the Arrow kernel below (the cosine/bigram treatment,
    round-15): HOF lambdas are CodegenFallback — interpreted, a
    per-character struct fold — and measured ~10x the vectorized kernel
    on the document fixture.
    """
    chars = F.split(text, "")
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + c) % FP_MOD,
    )


#: chunk width of the vectorized Horner fold: each chunk's dot product is
#: sum of codepoint (< 2^21) * power-mod (< 2^30) terms — 512 of them stay
#: < 2^60, exact in int64; the inter-chunk carry multiplies by 31^512 mod M
#: in Python ints (arbitrary precision), so the whole fold is exact.
_FP_CHUNK = 512
#: 31^(k) mod M for k = _FP_CHUNK-1 .. 0 (Horner weights of one chunk)
_FP_POWS = np.empty(_FP_CHUNK, dtype=np.int64)
_p = 1
for _i in range(_FP_CHUNK):
    _FP_POWS[_FP_CHUNK - 1 - _i] = _p
    _p = (_p * FP_BASE) % FP_MOD
del _p, _i
#: 31^_FP_CHUNK mod M — the carry multiplier between full chunks
_FP_CARRY = pow(FP_BASE, _FP_CHUNK, FP_MOD)


@pandas_udf(LongType())
def _rolling_fp_vec(texts: pandas.Series) -> pandas.Series:
    """Arrow-vectorized twin of :func:`rolling_fingerprint_fold` (guide
    §4.2, round-15): Horner's rule evaluated a chunk at a time — the
    codepoint array comes from one ``utf-32-le`` encode (Arrow strings
    are valid UTF-8, so no surrogate corner; Spark's ``split(text, '')``
    is codepoint-wise, verified on astral chars), each 512-codepoint
    chunk folds as one numpy dot against precomputed ``31^k mod M``
    weights (exact in int64 — see ``_FP_CHUNK``), and chunks chain with
    an arbitrary-precision Python-int carry. BIT-EXACT with the
    expression reference by construction: both compute
    ``sum(cp_i * 31^(n-1-i)) mod M`` over the same codepoint sequence,
    and the same corners hold (empty string -> 0 — the reference folds
    ``ascii('') = 0`` over ``split('','') = ['']``; NULL -> NULL).
    Pinned bitwise in tests/test_text.py over the fixture plus
    adversarial shapes (astral, combining marks, empty, NULL)."""
    out = np.zeros(len(texts), dtype=np.int64)
    mask = np.zeros(len(texts), dtype=bool)
    for i, s in enumerate(texts.to_numpy()):
        if s is None:
            mask[i] = True
            continue
        if not s:
            continue
        codes = np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype(
            np.int64
        )
        acc = 0
        n = len(codes)
        pos = 0
        while pos < n:
            chunk = codes[pos:pos + _FP_CHUNK]
            k = len(chunk)
            if k == _FP_CHUNK:
                acc = (acc * _FP_CARRY + int(chunk @ _FP_POWS)) % FP_MOD
            else:  # tail chunk: weights are the LAST k powers
                acc = (
                    acc * pow(FP_BASE, k, FP_MOD)
                    + int(chunk @ _FP_POWS[_FP_CHUNK - k:])
                ) % FP_MOD
            pos += k
        out[i] = acc
    res = pandas.Series(out)
    if mask.any():
        res = res.astype(object)
        res[mask] = None
    return res


# asNondeterministic (guide §4.4, the cosine/bigram precedent): consumers
# filter/dedup on the fingerprint column; without the mark, pushdown would
# clone the kernel below the gate and every row would pay the Python
# boundary twice. Constraint (round-14 advice): a nondeterministic-marked
# column cannot appear directly in a join condition — call sites project
# it first (withColumn/select) and reference it by name.
_rolling_fp_once = _rolling_fp_vec.asNondeterministic()


def rolling_fingerprint(text: Column) -> Column:
    """Karp-Rabin document fingerprint (see
    :func:`rolling_fingerprint_fold` for the pinned expression
    reference; this is the Arrow-kernel form used on hot paths).
    NOTE: the result column is nondeterministic-marked — project it
    before using it in a join condition or aggregate key."""
    return _rolling_fp_once(text)


def with_fingerprints(
    df: DataFrame, text_col: str = "text", kernel: bool = True
) -> DataFrame:
    """Add ``fingerprint`` (full-text Karp-Rabin) and ``fp_bucket`` (a
    near-dup prefilter key: first-8-chars hash + length/32).

    ``kernel`` picks the full-text implementation; BOTH are pinned
    bit-exact, so the choice is cost-only, never semantics:

    - ``True`` (default, the 100 TB-correct choice): the Arrow kernel —
      21× the fold at realistic ~5 KB documents, and in compositions
      whose consumers reference the fingerprint (dedup groupBy, filters)
      its ``asNondeterministic`` mark stops the optimizer re-deriving
      the fold per reference (measured 1.4× on the composed
      training-prep pipeline even at the 300-char fixture).
    - ``False``: the pure-expression fold — wins only in the regime
      where the per-row work is smaller than the Python/Arrow boundary
      tax: a BARE single-evaluation projection over small documents in
      small partitions (measured: the sub-second fixture-scale
      projection entry runs ~0.31 s fold vs ~0.58 s kernel, interleaved
      idle min-of-6 — the boundary's fixed per-task cost dominates at
      ~156 rows/partition × ~300 chars/doc).

    The 8-char ``fp_bucket`` prefix ALWAYS uses the fold: bounded
    constant work per row never amortizes a Python boundary."""
    text = F.col(text_col)
    full = (
        rolling_fingerprint(text)
        if kernel
        else rolling_fingerprint_fold(text)
    )
    return df.select(
        "*",
        full.alias("fingerprint"),
        (
            rolling_fingerprint_fold(F.substring(text, 1, 8)) * 1024
            + (F.length(text) / 32).cast("long")
        ).alias("fp_bucket"),
    )


# PII scrubbing (training-corpus redaction). Patterns are deliberately
# portable between Java regex (Spark) and RE2 (DuckDB oracle): character
# classes + bounded quantifiers only, no backreferences/lookaround. Order
# matters and is part of the contract: emails, then URLs, then phones
# (replacement tokens contain no digits, so later passes cannot re-match).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    # 9-15 DIGITS with at most 2 separator chars between digits: matches
    # international/formatted phone numbers (and 9+-digit account-ish ids,
    # which a scrubber SHOULD err toward redacting) while passing over
    # ISO dates (8 digits), version strings, and short numerics.
    ("phone", r"\+?[0-9]([-. ()]{0,2}[0-9]){8,14}", "<PHONE>"),
)


def scrub_pii(text: Column) -> Column:
    """Redact emails/URLs/phone numbers with typed placeholder tokens —
    the standard pre-training corpus hygiene pass. Pure codegen
    projection: single pass per pattern, no UDF, no shuffle —
    embarrassingly parallel at 100 TB."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``scrubbed`` plus per-category redaction counts (counted on the
    original text, before replacement)."""
    text = F.col(text_col)
    return df.select(
        "*",
        scrub_pii(text).alias("scrubbed"),
        *[
            F.regexp_count(text, F.lit(pat)).alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS
        ],
    )


def top_bigram_frac_fold(toks: Column) -> Column:
    """The original pure-expression bigram mode (kept as the semantic
    reference :func:`repetition_score_columns` is pinned against): a
    run-length fold over the SORTED bigram array (the longest equal-run
    in a sorted array IS the max count), value-identical to
    ``max(n)/sum(n)``. Higher-order lambdas are CodegenFallback —
    interpreted, no CSE — so this costs an O(n log n) sort plus a
    struct-allocating fold per row; round-14 replaced it on the hot
    path with the Arrow kernel below (a boundaries-expression rewrite
    was tried first and measured 135× WORSE: a lambda body referencing
    the sort re-evaluates it per element)."""
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    srt = F.array_sort(bigrams)

    def _run(acc, x):
        return F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))

    best_run = F.aggregate(
        srt,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            _run(acc, x).alias("run"),
            F.greatest(acc["best"], _run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(
        F.size(bigrams) > 0, best_run / F.size(bigrams)
    ).otherwise(F.lit(0.0))


@pandas_udf(DoubleType())
def _top_bigram_frac_vec(toks: pandas.Series) -> pandas.Series:
    """Arrow-vectorized bigram mode (round-14, guide §4.2): count the
    most frequent ADJACENT token pair per row with a Counter over
    tuples instead of sorting + run-length-folding a concatenated-string
    array in the interpreted expression evaluator. BIT-EXACT with
    :func:`top_bigram_frac_fold`: tokens are whitespace-split (no token
    contains the join separator), so pair-tuple counts equal
    concatenated-string counts; both forms divide the same two ints as
    IEEE doubles; fewer than two tokens (or NULL) is 0.0 both ways.
    Pinned bitwise over the full fixture + adversarial shapes in
    tests/test_text.py. Tokenization stays in the JVM — the kernel
    receives the token array, not the text."""
    from collections import Counter

    out = np.empty(len(toks), dtype=np.float64)
    for i, t in enumerate(toks.to_numpy()):
        if t is None or len(t) < 2:
            out[i] = 0.0
            continue
        c = Counter(zip(t[:-1], t[1:]))
        out[i] = max(c.values()) / (len(t) - 1)
    return pandas.Series(out)


# asNondeterministic (guide §4.4): the curation DAG filters on the
# computed column; without the mark, filter pushdown would CLONE the
# kernel below the gate (two ArrowEvalPython nodes, every row paying
# the boundary twice — the exact hazard the round-14 curation fix
# documented for the fold form).
_top_bigram_frac_once = _top_bigram_frac_vec.asNondeterministic()


def repetition_score_columns(text_col: str = "text") -> "dict[str, Column]":
    """The Gopher repetition signals of :func:`with_repetition_scores` as
    PURE PROJECTIONS — zero shuffles, so they compose into a Structured
    Streaming DAG where the aggregate form's groupBy+join cannot (an agg
    mid-stream forces update/complete output modes and watermark
    plumbing). The bigram mode is the Arrow kernel
    (:func:`_top_bigram_frac_vec`), value-identical to ``max(n)/sum(n)``
    and bit-exact with the expression reference
    (:func:`top_bigram_frac_fold`); equality with the aggregate form is
    pinned in tests/test_text.py.

    Per-row cost is O(tokens) in one vectorized batch pass; the
    aggregate form stays the right shape when one key groups MANY
    rows.

    Constraint: ``top_bigram_frac`` is nondeterministic-marked (to stop
    pushdown cloning the kernel), so it cannot appear DIRECTLY in a
    join condition or some aggregate positions — project it first and
    reference it by name, as the curation DAG does."""
    lines = F.split(F.col(text_col), "\n")
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    return {
        "n_tokens": F.size(toks),
        "dup_line_frac": (
            (F.size(lines) - F.size(F.array_distinct(lines))) / F.size(lines)
        ),
        "top_bigram_frac": _top_bigram_frac_once(toks),
    }


def with_repetition_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Add Gopher-style repetition signals per document: ``n_tokens``,
    ``dup_line_frac`` (share of newline-split lines that repeat — a pure
    codegen projection), and ``top_bigram_frac`` (most frequent word
    bigram's share — explode + two map-side-combined aggregates keyed on
    (id, bigram) then id, the only shuffle). Shared by the oracle-backed
    ``text_quality_repetition`` query and the streaming curation pipeline
    so the two can never drift. Documents with fewer than two tokens get
    ``top_bigram_frac`` 0.0.

    ``id_col`` must uniquely identify a text (rows sharing the key have
    their bigram counts pooled — callers scoring streams key on a content
    fingerprint for exactly this reason), and the output column names
    must be free in the input — enforced loudly rather than producing
    ambiguous duplicate columns downstream."""
    taken = {"n_tokens", "dup_line_frac", "top_bigram_frac", "_toks"} & set(
        df.columns
    )
    if taken:
        raise ValueError(
            f"with_repetition_scores output columns already present in the "
            f"input frame: {sorted(taken)} — drop or rename them first"
        )
    lines = F.split(F.col(text_col), "\n")
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    base = df.select(
        "*",
        F.size(toks).alias("n_tokens"),
        (
            (F.size(lines) - F.size(F.array_distinct(lines))) / F.size(lines)
        ).alias("dup_line_frac"),
        toks.alias("_toks"),
    )
    bigrams = F.when(
        F.size("_toks") >= 2,
        F.zip_with(
            F.slice("_toks", 1, F.size("_toks") - 1),
            F.slice("_toks", 2, F.size("_toks") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bistats = (
        base.select(id_col, F.explode(bigrams).alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count("*").alias("n"))
        .groupBy(id_col)
        .agg((F.max("n") / F.sum("n")).alias("top_bigram_frac"))
    )
    return (
        base.drop("_toks")
        .join(bistats, id_col, "left")
        .withColumn(
            "top_bigram_frac", F.coalesce(F.col("top_bigram_frac"), F.lit(0.0))
        )
    )
