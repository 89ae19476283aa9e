"""Generate a 10x scale dataset (sf1.0) from the driver's sf0.1 fixtures,
for scaling-ratio measurements (BASELINE.md / SCALING.md) — NOT for
correctness (oracles run on the driver's own data).

Replication preserves the data characteristics that govern the banded
dedup/similarity plans, so measured ratios reflect the algorithms rather
than artifacts of naive duplication:

- documents: per-replica TOKEN BIJECTION (every token gets a replica
  suffix). A bijection on tokens is a bijection on shingles, so each
  replica's internal near-dup structure (pairwise Jaccard, planted dups)
  is EXACTLY the original's, while cross-replica shingle overlap is zero
  — near-dup density per row stays constant at 10x rows. Naive copies
  would instead put 10 identical docs in every LSH bucket and blow
  candidate pairs up 100x.
- embeddings: per-replica fixed DIMENSION PERMUTATION + SIGN FLIPS — an
  orthogonal transform, so within-replica cosines are bit-preserved and
  cross-replica cosines scramble to noise. Same constant-density argument.
- lineitem/orders: replicas with shifted order keys (independent order
  "populations" against the same dims — the TPC-H fact-scaling shape).
- dims and events are copied as-is (facts scale, dims don't).

Deterministic (seed derived from replica index only). Output:
<repo>/.scaling/sf1.0/*.parquet
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
DST = Path(__file__).resolve().parents[1] / ".scaling" / "sf1.0"
REPLICAS = 10


def make_sf10_subset() -> None:
    """100× documents + embeddings ONLY (round-7 item 7: the two top
    growers — stream_curation_roundtrip / training_data_prep — read
    documents; dedup_semantic_clusters_lsh reads embeddings; generating
    the full table set at 100× would take disk and time the measurement
    doesn't need). Same structure-preserving transforms as sf1.0 —
    per-replica token bijection / orthogonal embedding transform — so
    near-dup density per row is constant at 100× rows."""
    dst = Path(__file__).resolve().parents[1] / ".scaling" / "sf10"
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    n_rep = 100
    doc_shift = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    union = " UNION ALL ".join(
        f"SELECT doc_id + {i} * {doc_shift} AS doc_id,"
        f" CASE WHEN {i} = 0 THEN text"
        f"      ELSE regexp_replace(text, '(\\S+)', '\\1x{i}', 'g') END AS text,"
        f" lang, source,"
        f" CASE WHEN {i} = 0 THEN n_chars"
        f"      ELSE length(regexp_replace(text, '(\\S+)', '\\1x{i}', 'g'))"
        f" END AS n_chars"
        f" FROM '{SRC}/documents.parquet'"
        for i in range(n_rep)
    )
    con.execute(
        f"COPY ({union}) TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )
    tbl = pq.read_table(SRC / "embeddings.parquet")
    vec = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    ids = tbl["vec_id"].to_numpy()
    labels = tbl["label"].to_numpy()
    vec_shift = int(ids.max()) + 1
    dim = vec.shape[1]
    parts = []
    for i in range(n_rep):
        rng = np.random.default_rng(1000 + i)
        if i == 0:
            out = vec
        else:
            perm = rng.permutation(dim)
            signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
            out = vec[:, perm] * signs
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(ids + i * vec_shift, pa.int64()),
                    "embedding": pa.array(list(out), pa.list_(pa.float32())),
                    "label": pa.array(labels, pa.int32()),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), dst / "embeddings.parquet")
    # orders at 100x (round-8 verdict item 6: the DML-plane growers —
    # catalog_sql_dml / catalog_sql_merge / schema_evolution_roundtrip —
    # read orders; the shifted-key replica shape matches sf1.0's)
    key_shift = con.execute(
        f"SELECT max(o_orderkey) + 1 FROM '{SRC}/orders.parquet'"
    ).fetchone()[0]
    union_o = " UNION ALL ".join(
        f"SELECT o_orderkey + {i} * {key_shift} AS o_orderkey, o_custkey,"
        f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        f" FROM '{SRC}/orders.parquet'"
        for i in range(n_rep)
    )
    con.execute(
        f"COPY ({union_o}) TO '{dst}/orders.parquet' (FORMAT PARQUET)"
    )
    for t in ("documents", "embeddings", "orders"):
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'"
        ).fetchone()[0]
        print(t, n)


def add_scaled_events() -> None:
    """10×/100× events tables into .scaling/sf1.0 and .scaling/sf10
    (round-10, verdict item 8: rollup_cdc_refresh reads events, which
    both fixtures had only COPIED — the streaming-adjacent DML plane had
    no scaled point). Replicas shift event_id and user_id (disjoint key
    spaces); ts / event_type / value distributions are untouched, so
    the day count — what the CDC refresh invalidates over — stays
    constant while per-day row volume scales, exactly the regime a
    growing event stream puts the rollup in."""
    con = duckdb.connect()
    id_shift = con.execute(
        f"SELECT max(event_id) + 1 FROM '{SRC}/events.parquet'"
    ).fetchone()[0]
    uid_shift = con.execute(
        f"SELECT max(user_id) + 1 FROM '{SRC}/events.parquet'"
    ).fetchone()[0]
    for dst, n_rep in ((DST, REPLICAS), (DST.parent / "sf10", 100)):
        dst.mkdir(parents=True, exist_ok=True)
        union = " UNION ALL ".join(
            f"SELECT event_id + {i} * {id_shift} AS event_id, ts,"
            f" user_id + {i} * {uid_shift} AS user_id,"
            f" event_type, value, props"
            f" FROM '{SRC}/events.parquet'"
            for i in range(n_rep)
        )
        con.execute(
            f"COPY ({union}) TO '{dst}/events.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/events.parquet'"
        ).fetchone()[0]
        print("events", dst.name, n)


def main() -> None:
    DST.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    # shift must clear BOTH key spaces: an order with no lineitems could
    # carry a key above max(l_orderkey) and collide across replicas
    key_shift = con.execute(
        f"SELECT greatest((SELECT max(l_orderkey) FROM '{SRC}/lineitem.parquet'),"
        f" (SELECT max(o_orderkey) FROM '{SRC}/orders.parquet')) + 1"
    ).fetchone()[0]
    doc_shift = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]

    def replicate(sql_per_replica: str, out: str) -> None:
        union = " UNION ALL ".join(
            sql_per_replica.format(i=i) for i in range(REPLICAS)
        )
        con.execute(f"COPY ({union}) TO '{DST}/{out}.parquet' (FORMAT PARQUET)")

    replicate(
        f"SELECT l_orderkey + {{i}} * {key_shift} AS l_orderkey, l_partkey,"
        f" l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount,"
        f" l_tax, l_returnflag, l_linestatus, l_shipdate"
        f" FROM '{SRC}/lineitem.parquet'",
        "lineitem",
    )
    replicate(
        f"SELECT o_orderkey + {{i}} * {key_shift} AS o_orderkey, o_custkey,"
        f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        f" FROM '{SRC}/orders.parquet'",
        "orders",
    )
    # replica 0 keeps the original text; replicas 1..9 suffix every token
    replicate(
        f"SELECT doc_id + {{i}} * {doc_shift} AS doc_id,"
        f" CASE WHEN {{i}} = 0 THEN text"
        f"      ELSE regexp_replace(text, '(\\S+)', '\\1x{{i}}', 'g') END AS text,"
        f" lang, source,"
        f" CASE WHEN {{i}} = 0 THEN n_chars"
        f"      ELSE length(regexp_replace(text, '(\\S+)', '\\1x{{i}}', 'g'))"
        f" END AS n_chars"
        f" FROM '{SRC}/documents.parquet'",
        "documents",
    )

    # embeddings: numpy orthogonal transform per replica
    tbl = pq.read_table(SRC / "embeddings.parquet")
    vec = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    ids = tbl["vec_id"].to_numpy()
    labels = tbl["label"].to_numpy()
    vec_shift = int(ids.max()) + 1
    dim = vec.shape[1]
    parts = []
    for i in range(REPLICAS):
        rng = np.random.default_rng(1000 + i)
        if i == 0:
            out = vec
        else:
            perm = rng.permutation(dim)
            signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
            out = vec[:, perm] * signs
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(ids + i * vec_shift, pa.int64()),
                    "embedding": pa.array(
                        list(out), pa.list_(pa.float32())
                    ),
                    "label": pa.array(labels, pa.int32()),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), DST / "embeddings.parquet")

    for small in ("region", "nation", "customer", "supplier", "part", "events"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{small}.parquet')"
            f" TO '{DST}/{small}.parquet' (FORMAT PARQUET)"
        )

    for t in ("lineitem", "orders", "documents", "embeddings"):
        n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    if "--events" in sys.argv:
        add_scaled_events()
    elif "--sf10" in sys.argv:
        make_sf10_subset()
    else:
        main()
