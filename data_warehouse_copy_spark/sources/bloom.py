"""File-level bloom-filter index for ManagedTable point lookups.

Min/max footer stats (``managed_table._harvest_stats``) prune range
predicates, but an equality lookup on a column the table is NOT clustered
on cannot be pruned by spans — every file's [min, max] covers almost any
key, so a point lookup opens every file. A per-file bloom filter answers
"does this file possibly contain value v?" with no false negatives, so
files whose bloom proves absence are dropped from the plan before Spark
lists them — the same planner trick as Delta's bloom-filter index, kept
sound by construction (a bloom can only KEEP a file it shouldn't, never
skip one it shouldn't).

Layout: one sidecar parquet per commit at ``_bloom/<commit_id>.parquet``
holding rows ``(file, col, vkind, n_bits, n_hashes, bits)`` — ``file`` is
the table-relative data-file path, ``bits`` the packed bitmap. Every
:class:`FileEntry` written by the commit points at the shared sidecar via
``bloom_path``, so the index rides the action log, vacuum, restore, and
CDC exactly like deletion vectors do.

Build is DISTRIBUTED: after ``_write_files`` lands a commit's data files,
one Spark job re-reads ONLY the bloom columns (column-pruned scan),
groups by ``_metadata.file_path`` (one pandas group per file — memory is
bounded by one file's bloom columns, not the commit), and builds the
bitmaps executor-side with vectorized hashing; the driver never holds
more than the single-task sidecar write. At 100 TB the build cost is one
extra columnar pass over the new files — the Delta bloom-index trade.

Hashing must be deterministic across processes and across the
write (column values) / read (predicate value) sides:

- integer columns (``vkind="i"``): the value's two's-complement uint64
  through two seeded splitmix64 finalizers — fully vectorized in numpy
  on the write side, identical scalar math on the read side;
- string columns (``vkind="s"``): blake2b-128 of the utf-8 bytes, split
  into two u64s.

Float/decimal/timestamp columns are deliberately NOT bloomed (float
repr/NaN equality hazards would risk unsound pruning); a predicate value
whose kind does not match the sidecar's recorded ``vkind`` simply keeps
the file — type-confused lookups degrade to unpruned, never to wrong.
"""

from __future__ import annotations

import threading
from hashlib import blake2b
from pathlib import Path

import numpy as np

BLOOM_DIR = "_bloom"

# ~10 bits/row with k=7 probes -> ~1% false-positive rate. The bitmap is
# clamped to [1 Kib, 8 Mib]: a huge file's bloom saturates toward
# "always keep" (sound, just unhelpful) instead of bloating the sidecar.
_BITS_PER_ROW = 10
_MIN_BITS = 1 << 10
_MAX_BITS = 1 << 23
_N_HASHES = 7

_SEED1 = np.uint64(0x9E3779B97F4A7C15)
_SEED2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix64(x: "np.ndarray | np.uint64") -> "np.ndarray | np.uint64":
    """splitmix64 finalizer — wraps mod 2^64 (numpy uint ops wrap
    silently), identical for arrays and scalars."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def value_kind(v) -> str | None:
    """The bloomable kind of a PREDICATE value: "i" for ints, "s" for
    strings, None for everything else (bool is an int subclass but an
    equality bloom on a 2-value column is useless — excluded)."""
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return "i"
    if isinstance(v, str):
        return "s"
    return None


def _int_hash_pair(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 arrays for an int64 array; h2 forced odd so the
    double-hash probe sequence never degenerates."""
    x = arr.astype(np.int64, copy=False).astype(np.uint64)
    h1 = _mix64(x ^ _SEED1)
    h2 = _mix64(x ^ _SEED2) | np.uint64(1)
    return h1, h2


def _str_hash_pair(s: str) -> tuple[int, int]:
    d = blake2b(s.encode("utf-8"), digest_size=16).digest()
    return (
        int.from_bytes(d[:8], "little"),
        int.from_bytes(d[8:], "little") | 1,
    )


def _scalar_hash_pair(vkind: str, v) -> tuple[int, int]:
    """The read-side hash of a predicate value — must match the write
    side bit for bit (the int path runs the SAME numpy math on a 0-d
    array)."""
    if vkind == "i":
        h1, h2 = _int_hash_pair(np.array([v], dtype=np.int64))
        return int(h1[0]), int(h2[0])
    return _str_hash_pair(v)


def _sizing(n_rows: int) -> int:
    bits = max(_MIN_BITS, min(_MAX_BITS, n_rows * _BITS_PER_ROW))
    return (bits + 7) & ~7  # whole bytes


def _set_bits(buf: np.ndarray, h1: np.ndarray, h2: np.ndarray, n_bits: int) -> None:
    """OR the k probe positions of every (h1, h2) pair into ``buf``
    (uint8 bitmap), fully vectorized: positions are (h1 + i*h2) mod
    n_bits for i in [0, k)."""
    ks = np.arange(_N_HASHES, dtype=np.uint64)
    idx = (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(n_bits)
    idx = idx.ravel()
    np.bitwise_or.at(
        buf,
        (idx >> np.uint64(3)).astype(np.int64),
        (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)),
    )


def _test_bits(bits: bytes, h1: int, h2: int, n_bits: int) -> bool:
    for i in range(_N_HASHES):
        # wrap mod 2^64 BEFORE mod n_bits — the write side's numpy uint64
        # arithmetic wraps, and (a mod 2^64) mod n != a mod n in general
        idx = ((h1 + i * h2) & 0xFFFFFFFFFFFFFFFF) % n_bits
        if not (bits[idx >> 3] >> (idx & 7)) & 1:
            return False
    return True


def column_kinds(schema, bloom_cols: list) -> dict[str, str]:
    """col -> vkind for the subset of ``bloom_cols`` whose Spark type is
    bloomable (integer family -> "i", string -> "s"); silently drops the
    rest so a table config naming an unbloomable column degrades to
    no-index rather than failing writes."""
    from pyspark.sql import types as T

    kinds: dict[str, str] = {}
    for f in schema.fields:
        if f.name not in bloom_cols:
            continue
        if isinstance(
            f.dataType, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            kinds[f.name] = "i"
        elif isinstance(f.dataType, T.StringType):
            kinds[f.name] = "s"
    return kinds


# Commits up to this many rows build their sidecar DRIVER-SIDE with
# pyarrow (a column-pruned local read + vectorized hashing) — a Spark
# job's fixed cost (python workers, Arrow exchange, an extra write job)
# dwarfs the hashing work at this size. Bigger commits run the
# distributed build. Both paths produce bit-identical sidecars.
_LOCAL_BUILD_MAX_ROWS = 1_000_000


def _pa_kinds(schema, bloom_cols: list) -> dict[str, str]:
    """column_kinds over a PYARROW schema (the local-build twin)."""
    import pyarrow as pa

    kinds: dict[str, str] = {}
    for f in schema:
        if f.name not in bloom_cols:
            continue
        if pa.types.is_integer(f.type):
            kinds[f.name] = "i"
        elif pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
            kinds[f.name] = "s"
    return kinds


def _bitmap_for(values_i, values_s, vkind: str, n_bits: int) -> bytes:
    """One column's packed bitmap from its non-null values (int ndarray
    or str list) — the single hashing definition both builds share."""
    buf = np.zeros(n_bits >> 3, dtype=np.uint8)
    if vkind == "i":
        if len(values_i):
            h1, h2 = _int_hash_pair(values_i)
            _set_bits(buf, h1, h2, n_bits)
    else:
        if values_s:
            hs = [_str_hash_pair(v) for v in values_s]
            _set_bits(
                buf,
                np.array([h[0] for h in hs], dtype=np.uint64),
                np.array([h[1] for h in hs], dtype=np.uint64),
                n_bits,
            )
    return buf.tobytes()


def _build_sidecar_local(
    root: Path, file_rel_paths: list[str], bloom_cols: list, dest: Path
) -> bool:
    """Driver-side sidecar build: per file, a column-pruned pyarrow read
    + the shared vectorized hashing. Returns False when no column is
    bloomable (no sidecar written)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = {"file": [], "col": [], "vkind": [], "n_bits": [],
            "n_hashes": [], "bits": []}
    for rel in file_rel_paths:
        pf = pq.ParquetFile(root / rel)
        kinds = _pa_kinds(pf.schema_arrow, bloom_cols)
        if not kinds:
            continue
        n_bits = _sizing(pf.metadata.num_rows)
        t = pq.read_table(root / rel, columns=list(kinds))
        for col, vkind in kinds.items():
            vals = t[col].drop_null()
            bits = _bitmap_for(
                vals.to_numpy(zero_copy_only=False).astype(np.int64)
                if vkind == "i"
                else None,
                vals.to_pylist() if vkind == "s" else None,
                vkind,
                n_bits,
            )
            rows["file"].append(rel)
            rows["col"].append(col)
            rows["vkind"].append(vkind)
            rows["n_bits"].append(n_bits)
            rows["n_hashes"].append(_N_HASHES)
            rows["bits"].append(bits)
    if not rows["file"]:
        return False
    dest.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "file": pa.array(rows["file"], pa.string()),
                "col": pa.array(rows["col"], pa.string()),
                "vkind": pa.array(rows["vkind"], pa.string()),
                "n_bits": pa.array(rows["n_bits"], pa.int64()),
                "n_hashes": pa.array(rows["n_hashes"], pa.int32()),
                "bits": pa.array(rows["bits"], pa.binary()),
            }
        ),
        dest,
    )
    return True


def build_bloom_sidecar(
    spark,
    root: Path,
    files: "list[tuple[str, int]]",
    bloom_cols: list,
    commit_id: str,
) -> str | None:
    """Build per-file blooms for ``bloom_cols`` over the commit's data
    files (``(rel_path, rows)`` pairs) and write ONE sidecar parquet at
    ``_bloom/<commit_id>.parquet``. Returns the sidecar's table-relative
    path, or None when nothing is bloomable. Small commits build locally
    (pyarrow, no Spark job); large ones run the distributed build — see
    the module docstring."""
    import shutil
    import uuid as _uuid

    from pyspark.sql import functions as F

    if not files or not bloom_cols:
        return None
    rel_side = f"{BLOOM_DIR}/{commit_id}.parquet"
    file_rel_paths = [p for p, _ in files]
    if sum(r for _, r in files) <= _LOCAL_BUILD_MAX_ROWS:
        if _build_sidecar_local(
            root, file_rel_paths, list(bloom_cols), root / rel_side
        ):
            return rel_side
        return None
    abs_paths = [str(root / p) for p in file_rel_paths]
    df = spark.read.parquet(*abs_paths)
    kinds = column_kinds(df.schema, list(bloom_cols))
    if not kinds:
        return None
    root_str = str(root.resolve())
    scan = df.select(
        F.col("_metadata.file_path").alias("__uri"), *kinds.keys()
    )

    def _build(pdf):
        import pandas as pd
        from urllib.parse import unquote, urlparse

        # unquote: Hadoop percent-encodes URL-special characters (spaces
        # etc.) in _metadata.file_path; without decoding, relative_to
        # raises executor-side under such roots (same as _uri_to_rel)
        uri = pdf["__uri"].iloc[0]
        rel = str(Path(unquote(urlparse(uri).path)).resolve().relative_to(root_str))
        n_bits = _sizing(len(pdf))
        out = []
        for col, vkind in kinds.items():
            s = pdf[col].dropna()
            buf = np.zeros(n_bits >> 3, dtype=np.uint8)
            if len(s):
                if vkind == "i":
                    # nulls upcast int columns to float64 in pandas; the
                    # surviving values are integral, so the round trip
                    # through int64 is exact
                    h1, h2 = _int_hash_pair(
                        s.to_numpy(dtype=np.int64, copy=False)
                        if s.dtype.kind in "iu"
                        else s.to_numpy(dtype=np.float64).astype(np.int64)
                    )
                    _set_bits(buf, h1, h2, n_bits)
                else:
                    hs = [_str_hash_pair(v) for v in s.astype(str)]
                    _set_bits(
                        buf,
                        np.array([h[0] for h in hs], dtype=np.uint64),
                        np.array([h[1] for h in hs], dtype=np.uint64),
                        n_bits,
                    )
            out.append((rel, col, vkind, n_bits, _N_HASHES, buf.tobytes()))
        return pd.DataFrame(
            out, columns=["file", "col", "vkind", "n_bits", "n_hashes", "bits"]
        )

    res = scan.groupBy("__uri").applyInPandas(
        _build,
        "file string, col string, vkind string, n_bits long, "
        "n_hashes int, bits binary",
    )
    staging = root / "_staging" / f"bloom-{_uuid.uuid4().hex}"
    # single-file sidecar via one write task: the bitmaps stream through
    # the task, never the driver
    res.coalesce(1).write.mode("overwrite").parquet(str(staging))
    parts = list(staging.rglob("part-*.parquet"))
    dest = root / rel_side
    dest.parent.mkdir(parents=True, exist_ok=True)
    shutil.move(str(parts[0]), str(dest))
    shutil.rmtree(staging, ignore_errors=True)
    return rel_side


# Sidecar parse cache: sidecar files are immutable (uuid commit names),
# so entries never go stale; keyed by absolute path, capped.
_SIDECAR_CACHE: dict[str, dict] = {}
_SIDECAR_GUARD = threading.Lock()
_SIDECAR_CACHE_MAX = 16


def _sidecar(root: Path, rel: str) -> dict:
    """{(file_rel, col): (vkind, n_bits, n_hashes, bits)} for one sidecar."""
    key = str((root / rel).resolve())
    with _SIDECAR_GUARD:
        hit = _SIDECAR_CACHE.get(key)
    if hit is not None:
        return hit
    import pyarrow.parquet as pq

    t = pq.read_table(key)
    # Dual keying: sidecar rows store paths relative to the SOURCE table
    # root (the sidecar's grandparent dir), but a shallow clone's
    # manifest references the same files by ABSOLUTE path — index both
    # forms so cloned tables keep bloom pruning, soundly (exact-path
    # match only, never a basename heuristic).
    side_root = Path(key).parent.parent
    d = {}
    for f, c, vk, nb, nh, bts in zip(
        t["file"].to_pylist(),
        t["col"].to_pylist(),
        t["vkind"].to_pylist(),
        t["n_bits"].to_pylist(),
        t["n_hashes"].to_pylist(),
        t["bits"].to_pylist(),
    ):
        rec = (vk, nb, nh, bts)
        d[(f, c)] = rec
        d[(str(side_root / f), c)] = rec
    with _SIDECAR_GUARD:
        if key not in _SIDECAR_CACHE and len(_SIDECAR_CACHE) >= _SIDECAR_CACHE_MAX:
            _SIDECAR_CACHE.pop(next(iter(_SIDECAR_CACHE)))
        _SIDECAR_CACHE[key] = d
    return d


def _probe_groups(where: list) -> list:
    """Precompute the bloom probes for ``=``/``in`` conjuncts of a
    ``where`` list: [(col, [(vkind, h1, h2), ...])]. A conjunct with any
    unbloomable or unhashable value is dropped (it can never prune)."""
    groups: list[tuple[str, list]] = []
    for c, op, v in where:
        if op == "=":
            vals = [v]
        elif op == "in" and isinstance(v, (list, tuple, set)):
            vals = list(v)
        else:
            continue
        probes, prunable = [], bool(vals)
        for x in vals:
            vk = value_kind(x)
            if vk is None:
                # an unbloomable value (float/bool) might be present in
                # any file — this conjunct can never prune
                prunable = False
                break
            try:
                probes.append((vk, *_scalar_hash_pair(vk, x)))
            except OverflowError:
                prunable = False  # can't hash it -> can't prove absence
                break
        if prunable:
            groups.append((c, probes))
    return groups


def bloom_keeper(root: Path, where: list):
    """``keep(path, bloom_path) -> bool`` with the probes precomputed —
    the per-file bloom test shared by batch reads, DML candidate
    selection, and the declarative CDC/stream tails (whose entries are
    raw dicts, not FileEntry objects). False only when a bitmap PROVES
    every ``=``/``in`` value of some conjunct absent from the file."""
    groups = _probe_groups(where)
    if not groups:
        return lambda path, bloom_path: True

    def keep(path: str, bloom_path: str | None) -> bool:
        if not bloom_path:
            return True
        side = _sidecar(root, bloom_path)
        for c, probes in groups:
            rec = side.get((path, c))
            if rec is None:
                continue  # no bitmap for this column -> cannot prune
            if not any(
                vk != rec[0]  # kind mismatch: that value MAY be present
                or _test_bits(rec[3], h1, h2, rec[1])
                for vk, h1, h2 in probes
            ):
                return False
        return True

    return keep


def bloom_prune(root: Path, entries: list, where: list) -> list:
    """Drop FileEntry-shaped entries whose bloom proves no row satisfies
    an ``=``/``in`` predicate in ``where`` (for ``in``, a file survives
    if ANY listed value may be present). Entries without a bloom,
    columns without a bitmap (schema evolution, unbloomable type), and
    kind-mismatched predicate values are all kept — pruning only ever
    narrows.

    Driver-side cost: one cached sidecar parse per commit represented in
    ``entries`` plus k bit probes per (file, predicate value) — metadata
    scale, the same order as the min/max span walk it composes with."""
    keep = bloom_keeper(root, where)
    return [
        f for f in entries if keep(f.path, getattr(f, "bloom_path", None))
    ]
