"""Object-store commit protocol (VERDICT r5 item 4): the log's
put-if-absent CAS extracted behind CommitProtocol. The POSIX link
protocol stays the default; a ConditionalPutCommitProtocol backed by a
mock S3-class store (no hard links, no atomic rename) must carry the
whole concurrency story — storms, injected CAS races, rebases — without
ever touching os.link/os.replace on the log."""

from __future__ import annotations

import json
import sys
import threading
from pathlib import Path

import pytest
from pyspark.sql import types as T

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import data_warehouse_copy_spark.sources.commit_protocol as cp  # noqa: E402
from data_warehouse_copy_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)

SCHEMA = T.StructType(
    [T.StructField("writer", T.LongType()), T.StructField("seq", T.LongType())]
)


@pytest.fixture()
def store(tmp_path):
    s = cp.InMemoryObjectStore()
    cp.register_commit_protocol(tmp_path, cp.ConditionalPutCommitProtocol(s))
    yield s
    cp.unregister_commit_protocol(tmp_path)


def _no_posix_atomics(monkeypatch, log_tails=("_log",)):
    """Make os.link / os.replace FAIL for any path under a _log dir —
    proving the store protocol never leans on POSIX atomics."""
    import os as _os

    real_link, real_replace = _os.link, _os.replace

    def guard(fn):
        def inner(src, dst, *a, **kw):
            if any(t in str(dst) for t in log_tails) or any(
                t in str(src) for t in log_tails
            ):
                raise OSError("object store: no POSIX atomics")
            return fn(src, dst, *a, **kw)

        return inner

    monkeypatch.setattr(_os, "link", guard(real_link))
    monkeypatch.setattr(_os, "replace", guard(real_replace))


def test_store_protocol_basic_roundtrip(tmp_path, store, monkeypatch):
    _no_posix_atomics(monkeypatch)
    t = ManagedTable.create(None, tmp_path / "t")
    t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)
    t.append_pylist([{"writer": 1, "seq": 2}], SCHEMA)
    assert t.snapshot().total_rows == 2
    assert t.snapshot().version == 2
    # the log lives in the STORE, not the filesystem
    assert not list((tmp_path / "t" / "_log").glob("*.json"))
    assert store.get(str(tmp_path / "t" / "_log" / f"{1:020d}.json"))


def test_threaded_storm_under_store_protocol(tmp_path, store, monkeypatch):
    """N threads x K appends through the conditional-put CAS: every
    commit survives, versions are gapless, zero lost updates."""
    _no_posix_atomics(monkeypatch)
    root = tmp_path / "t"
    ManagedTable.create(None, root)
    n_threads, n_appends = 6, 5
    errors: list = []

    def worker(wid: int):
        try:
            # fresh handle per thread (separate writers); the in-process
            # commit lock serializes same-root writers, so drop it to
            # exercise the optimistic CAS itself
            t = ManagedTable(None, root)
            for i in range(n_appends):
                t.append_pylist([{"writer": wid, "seq": i}], SCHEMA)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=worker, args=(w,)) for w in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    t = ManagedTable(None, root)
    m = t.snapshot()
    assert m.total_rows == n_threads * n_appends
    assert m.version == n_threads * n_appends
    # gapless immutable records, all in the store
    for v in range(m.version + 1):
        assert store.get(str(root / "_log" / f"{v:020d}.json")) is not None


def test_injected_cas_race_rebases_cleanly(tmp_path, store, monkeypatch):
    """A competitor lands the exact version our writer is CASing — at the
    CAS window itself. The writer must lose, rebase, and land on the
    next version without dropping either commit."""
    _no_posix_atomics(monkeypatch)
    root = tmp_path / "t"
    t = ManagedTable.create(None, root)
    t.append_pylist([{"writer": 0, "seq": 0}], SCHEMA)

    fired = {"n": 0}

    # The competitor fires from inside OUR commit's CAS window (which
    # holds the in-process root lock), so it pre-claims the version
    # record directly in the store — exactly what a REMOTE process's
    # winning conditional put looks like from this store's side.
    def preclaim(key: str):
        if key.endswith(f"{2:020d}.json") and fired["n"] == 0:
            fired["n"] = 1
            raw1 = json.loads(store.get(str(root / "_log" / f"{1:020d}.json")))
            store.put(
                key,
                json.dumps(
                    {
                        "version": 2,
                        "op": "append",
                        "ts": raw1["ts"],
                        "ets": raw1.get("ets", raw1["ts"]),
                        "add": [],
                        "remove": [],
                        "schema_json": None,
                        "txn": None,
                    }
                ),
            )

    store.before_cas = preclaim
    t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)
    store.before_cas = None
    m = t.snapshot()
    assert fired["n"] == 1
    assert m.version == 3  # lost v2 to the preclaim, rebased onto v3
    assert m.total_rows == 2  # both real commits' rows survive


def test_unregistered_roots_keep_link_protocol(tmp_path):
    t = ManagedTable.create(None, tmp_path / "plain")
    t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)
    assert (tmp_path / "plain" / "_log" / f"{1:020d}.json").exists()


def test_store_protocol_checkpoints_in_store(tmp_path, store, monkeypatch):
    import data_warehouse_copy_spark.sources.managed_table as mt

    _no_posix_atomics(monkeypatch)
    root = tmp_path / "t"
    t = ManagedTable.create(None, root)
    for i in range(mt._CKPT_EVERY):
        t.append_pylist([{"writer": 0, "seq": i}], SCHEMA)
    ck = store.get(
        str(root / "_log" / f"{mt._CKPT_EVERY:020d}.checkpoint.json")
    )
    assert ck is not None and json.loads(ck)["version"] == mt._CKPT_EVERY
    # reconstruction replays from the store-held checkpoint
    assert t.snapshot().total_rows == mt._CKPT_EVERY


# ------------------------------------------------ fault/latency drills


@pytest.fixture()
def faulty(tmp_path):
    """An InMemoryObjectStore wrapped in the fault injector; tests set
    the injection plan on the wrapper before committing."""
    inner = cp.InMemoryObjectStore()
    f = cp.FaultyObjectStore(inner)
    cp.register_commit_protocol(tmp_path, cp.ConditionalPutCommitProtocol(f))
    yield f
    cp.unregister_commit_protocol(tmp_path)


def test_lost_response_winner_recovers(tmp_path, faulty, monkeypatch):
    """'PUT applied, ack lost' on a winning commit: the protocol's
    recovery read sees our exact payload and reports the win — the
    caller must NOT retry at the next version (that would double-commit
    the same files)."""
    _no_posix_atomics(monkeypatch)
    t = ManagedTable.create(None, tmp_path / "t")  # v0 create = CAS #0
    faulty.lose_response_on = {faulty.cas_calls}   # the next CAS: v1
    t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)
    m = t.snapshot()
    assert m.version == 1 and m.total_rows == 1  # exactly once
    t.append_pylist([{"writer": 1, "seq": 2}], SCHEMA)
    assert t.snapshot().total_rows == 2


def test_lost_response_loser_sees_conflict(tmp_path, faulty, monkeypatch):
    """Ack lost while a RACER's record is what actually landed: the
    recovery read finds a different payload and reports the loss, so the
    normal conflict/rebase path runs — never a silent lost update."""
    _no_posix_atomics(monkeypatch)
    t = ManagedTable.create(None, tmp_path / "t")
    t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)

    inner = faulty.inner
    key = str(tmp_path / "t" / "_log" / f"{2:020d}.json")
    racer_payload = json.dumps(
        {
            "version": 2, "op": "append", "ts": "2026-01-01T00:00:00.0Z",
            "ets": "2026-01-01T00:00:00.0Z", "add": [], "remove": [],
            "schema_json": None, "txn": None,
        }
    )
    real_cas = inner.put_if_absent

    def racer_wins_then_applied(k, data):
        if k == key and inner.get(k) is None:
            real_cas(k, racer_payload)  # the racer's record lands first
        return real_cas(k, data)

    inner.put_if_absent = racer_wins_then_applied
    # our CAS for v2 loses; no fault needed — but ALSO lose the ack, so
    # recovery must distinguish "racer's record" from "ours"
    faulty.lose_response_on = {faulty.cas_calls}
    t.append_pylist([{"writer": 1, "seq": 2}], SCHEMA)
    m = t.snapshot()
    # our append rebased to v3 on top of the racer's empty v2
    assert m.version == 3 and m.total_rows == 2


def test_pre_apply_fault_retries(tmp_path, faulty, monkeypatch):
    """A request that never reached the store is retried inside the
    protocol — the caller sees neither an error nor a version gap."""
    _no_posix_atomics(monkeypatch)
    t = ManagedTable.create(None, tmp_path / "t")
    faulty.fail_before_on = {faulty.cas_calls, faulty.cas_calls + 1}
    t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)
    assert t.snapshot().version == 1
    assert t.snapshot().total_rows == 1


def test_persistent_outage_surfaces(tmp_path, faulty, monkeypatch):
    """A store that keeps failing pre-apply must eventually raise the
    transient error (bounded retries), never loop forever or guess."""
    _no_posix_atomics(monkeypatch)
    t = ManagedTable.create(None, tmp_path / "t")
    faulty.fail_before_on = set(range(faulty.cas_calls, faulty.cas_calls + 50))
    with pytest.raises(cp.TransientStoreError, match="unavailable"):
        t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)
    faulty.fail_before_on = set()
    t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)  # store recovered
    assert t.snapshot().total_rows == 1


def test_storm_with_latency_and_lost_responses(tmp_path, faulty, monkeypatch):
    """The round-6 storm drill under injected 1 ms latency + periodic
    lost responses: every commit lands exactly once, versions gapless."""
    _no_posix_atomics(monkeypatch)
    faulty.latency_s = 0.001
    faulty.lose_response_on = set(range(0, 500, 7))  # every 7th CAS
    root = tmp_path / "t"
    ManagedTable.create(None, root)
    N, K = 4, 5
    errors: list = []

    def writer(w):
        t = ManagedTable(None, root)
        for s in range(K):
            try:
                t.append_pylist([{"writer": w, "seq": s}], SCHEMA)
            except Exception as e:  # noqa: BLE001 — the drill records all
                errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(N)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    t = ManagedTable(None, root)
    m = t.snapshot()
    assert m.total_rows == N * K  # zero lost, zero doubled
    assert m.version == N * K


def test_identical_metadata_commits_disambiguated_by_nonce(
    tmp_path, faulty, monkeypatch
):
    """Round-7 advisor finding: two racing METADATA-ONLY commits (here:
    the same constraint drop attempted by two handles) can serialize
    byte-identically when their wall-clock ts collide — payload-equality
    recovery would then let BOTH writers claim the same landed record.
    The per-writer nonce (injected at the _put_version CAS funnel) makes
    every payload unique by construction: the second writer's lost-ack
    recovery must see a DIFFERENT payload and take the conflict path."""
    _no_posix_atomics(monkeypatch)
    root = tmp_path / "t"
    t1 = ManagedTable.create(None, root)
    t1.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)

    inner = faulty.inner
    key = str(root / "_log" / f"{2:020d}.json")
    real_cas = inner.put_if_absent
    landed: list[str] = []

    def racer_lands_twin(k, data):
        if k == key and inner.get(k) is None:
            # the racer is an independent writer whose record came out
            # byte-identical EXCEPT the nonce (same wall-clock ts, same
            # metadata-only diff — the pre-nonce ambiguity): its commit
            # lands first, recording an empty diff at v2.
            import json as _json

            rec = _json.loads(data)
            racer = dict(rec, add=[], remove=[], nonce="f" * 32)
            landed.append(data)
            real_cas(k, _json.dumps(racer, indent=1))
            return real_cas(k, data)
        return real_cas(k, data)

    inner.put_if_absent = racer_lands_twin
    faulty.lose_response_on = {faulty.cas_calls}
    # our append's CAS for v2: the racer's near-twin record lands first,
    # our ack is lost. Pre-nonce, two metadata-only twins compared EQUAL
    # here and both writers claimed the same record; with the nonce the
    # recovery read sees a different payload → conflict → clean rebase.
    t1.append_pylist([{"writer": 1, "seq": 2}], SCHEMA)
    m = ManagedTable(None, root).snapshot()
    assert m.version == 3 and m.total_rows == 2  # exactly once, rebased
    # and the nonce is what distinguished the records: modulo nonce (and
    # the rebase's version/diff fields), the racer's v2 record mirrors
    # our payload shape
    import json as _json

    v2 = _json.loads(inner.get(key))
    ours = _json.loads(landed[0])
    assert v2["nonce"] != ours["nonce"]
    assert v2["ts"] == ours["ts"] and v2["op"] == ours["op"]


def test_recovery_read_survives_transient_get_faults(
    tmp_path, faulty, monkeypatch
):
    """Lost-ack CAS whose first recovery reads ALSO time out: the
    protocol retries the read (bounded) instead of aborting a commit
    whose write may have applied — aborting there reports failure for a
    landed record, the exact ambiguity recovery exists to resolve."""
    _no_posix_atomics(monkeypatch)
    t = ManagedTable.create(None, tmp_path / "t")
    key = str(tmp_path / "t" / "_log" / f"{1:020d}.json")
    real_get = faulty.inner.get
    fails = {"n": 2}

    def flaky_get(k):
        v = real_get(k)
        if k == key and v is not None and fails["n"] > 0:
            # the applied record is there, but THIS read times out —
            # exactly the recovery reads following the lost-ack CAS
            fails["n"] -= 1
            raise cp.TransientStoreError("injected recovery-read fault")
        return v

    faulty.inner.get = flaky_get
    faulty.lose_response_on = {faulty.cas_calls}
    t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)
    m = t.snapshot()
    assert m.version == 1 and m.total_rows == 1  # exactly once
    assert fails["n"] == 0  # both injected read faults were retried


def test_recovery_read_persistent_outage_surfaces_unknown(
    tmp_path, faulty, monkeypatch
):
    """If the recovery read NEVER succeeds the protocol must surface the
    unknown outcome loudly (TransientStoreError), not guess a side."""
    _no_posix_atomics(monkeypatch)
    t = ManagedTable.create(None, tmp_path / "t")
    key = str(tmp_path / "t" / "_log" / f"{1:020d}.json")
    real_get = faulty.inner.get

    def dead_get(k):
        v = real_get(k)
        if k == key and v is not None:
            raise cp.TransientStoreError("injected recovery-read outage")
        return v

    faulty.inner.get = dead_get
    faulty.lose_response_on = {faulty.cas_calls}
    with pytest.raises(cp.TransientStoreError, match="UNKNOWN"):
        t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)


# ---------------------------------------------- durable LocalFS adapter


def _cas_race_worker(args):
    """Top-level (picklable) cross-PROCESS CAS racer: each process gets
    its own LocalFSObjectStore handle over the same directory and races
    put_if_absent on the same keys."""
    key, payload = args
    s = cp.LocalFSObjectStore()
    won = s.put_if_absent(key, payload)
    seen = s.get(key)
    return won, payload, seen


def test_localfs_cas_is_atomic_across_processes(tmp_path):
    """Round-9 (verdict "What's missing" 4): the conditional-put CAS
    over a DURABLE store, raced by real OS processes (not threads) —
    exactly one winner per key, losers observe the winner's COMPLETE
    payload, never a partial object."""
    import multiprocessing as mp

    n_keys, racers_per_key = 4, 6
    jobs = [
        (str(tmp_path / f"k{k}"), f"proc{p}-payload-{'x' * 2048}")
        for k in range(n_keys)
        for p in range(racers_per_key)
    ]
    with mp.get_context("fork").Pool(8) as pool:
        results = pool.map(_cas_race_worker, jobs)
    by_key: dict = {}
    for (key, _), (won, payload, seen) in zip(jobs, results):
        by_key.setdefault(key, []).append((won, payload, seen))
    for key, rs in by_key.items():
        winners = [payload for won, payload, _ in rs if won]
        assert len(winners) == 1, key  # exactly one CAS winner
        final = cp.LocalFSObjectStore().get(key)
        assert final == winners[0]
        for _, _, seen in rs:
            # every racer's read-after observed a complete object
            assert seen == winners[0]


def test_localfs_store_fsyncs_directory_entry(tmp_path, monkeypatch):
    """Round-10 advice fix: content fsync alone is not durability — the
    directory ENTRY needs an fsync on the directory fd, or a power loss
    after the ack can drop an already-acked committed key (lost-ack
    recovery assumes the winner's object survives). Pin that every
    acked put/put_if_absent fsyncs the destination's parent, and a CAS
    loser (no new entry) does not."""
    synced = []
    real = cp.LocalFSObjectStore._fsync_dir
    monkeypatch.setattr(
        cp.LocalFSObjectStore,
        "_fsync_dir",
        staticmethod(lambda p: (synced.append(Path(p)), real(p))[1]),
    )
    s = cp.LocalFSObjectStore()
    key = str(tmp_path / "sub" / "k1")
    assert s.put_if_absent(key, "v1")
    assert synced == [tmp_path / "sub"]
    assert not s.put_if_absent(key, "v2")  # loser: no entry, no fsync
    assert synced == [tmp_path / "sub"]
    s.put(str(tmp_path / "sub" / "k2"), "v3")
    assert synced == [tmp_path / "sub"] * 2
    assert s.get(key) == "v1"


def _append_storm_worker(args):
    root, wid, n_appends = args
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("writer", T.LongType()), T.StructField("seq", T.LongType())]
    )
    cp.register_commit_protocol(
        Path(root).parent, cp.ConditionalPutCommitProtocol(cp.LocalFSObjectStore())
    )
    t = ManagedTable(None, root)
    for i in range(n_appends):
        t.append_pylist([{"writer": wid, "seq": i}], schema)
    return wid


def test_localfs_store_multiprocess_table_storm(tmp_path):
    """The full commit protocol (optimistic CAS + rebase) over the
    durable adapter under MULTI-PROCESS contention — the in-process
    table lock cannot serialize these writers, so every conflict runs
    the real store-level CAS + action-log rebase. Every commit must
    survive, versions gapless, zero lost updates, and a FRESH process
    (this one) reads the final state from disk alone."""
    import multiprocessing as mp

    root = tmp_path / "t"
    cp.register_commit_protocol(
        tmp_path, cp.ConditionalPutCommitProtocol(cp.LocalFSObjectStore())
    )
    try:
        ManagedTable.create(None, root)
        n_proc, n_appends = 4, 4
        with mp.get_context("fork").Pool(n_proc) as pool:
            pool.map(
                _append_storm_worker,
                [(str(root), w, n_appends) for w in range(n_proc)],
            )
        t = ManagedTable(None, root)
        m = t.snapshot()
        assert m.total_rows == n_proc * n_appends
        assert m.version == n_proc * n_appends
        store = cp.LocalFSObjectStore()
        for v in range(m.version + 1):
            raw = store.get(str(root / "_log" / f"{v:020d}.json"))
            assert raw is not None
            json.loads(raw)  # complete, parseable records only
    finally:
        cp.unregister_commit_protocol(tmp_path)


def test_localfs_lost_ack_recovery_is_durable(tmp_path):
    """The lost-ack drill over the durable adapter: the recovery read
    resolves 'PUT applied, ack lost' from DISK state, and a brand-new
    protocol instance (a restarted process) sees the same committed
    record — the recovery story no longer rests on in-memory mock
    behavior."""
    faulty = cp.FaultyObjectStore(cp.LocalFSObjectStore())
    cp.register_commit_protocol(
        tmp_path, cp.ConditionalPutCommitProtocol(faulty)
    )
    try:
        t = ManagedTable.create(None, tmp_path / "t")  # v0 create
        faulty.lose_response_on = {faulty.cas_calls}   # next CAS: v1
        t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)
        assert t.snapshot().version == 1
        assert t.snapshot().total_rows == 1  # exactly once, not retried
    finally:
        cp.unregister_commit_protocol(tmp_path)
    # "restart": fresh protocol over a fresh store handle, disk only
    cp.register_commit_protocol(
        tmp_path, cp.ConditionalPutCommitProtocol(cp.LocalFSObjectStore())
    )
    try:
        t2 = ManagedTable(None, tmp_path / "t")
        assert t2.snapshot().version == 1
        assert t2.snapshot().total_rows == 1
        t2.append_pylist([{"writer": 2, "seq": 2}], SCHEMA)
        assert t2.snapshot().total_rows == 2
    finally:
        cp.unregister_commit_protocol(tmp_path)


# ---------------------------------------------------------------------------
# Network-boundary adapter (round-10 verdict item 5): the SAME protocol
# matrix over a real localhost socket — serialization, connect, timeout,
# and genuinely lost responses the in-process adapters cannot produce.


@pytest.fixture()
def http_bucket(tmp_path):
    from data_warehouse_copy_spark.sources.http_store import (
        HttpObjectStore,
        HttpObjectStoreServer,
    )

    with HttpObjectStoreServer() as srv:
        client = HttpObjectStore(srv.port)
        cp.register_commit_protocol(
            tmp_path, cp.ConditionalPutCommitProtocol(client)
        )
        yield srv, client
        cp.unregister_commit_protocol(tmp_path)


def test_http_store_contract_semantics(http_bucket):
    """201/412/404 mapping at the adapter level — the store contract."""
    srv, client = http_bucket
    assert client.get("a/b c.json") is None
    assert client.put_if_absent("a/b c.json", "one") is True
    assert client.put_if_absent("a/b c.json", "two") is False
    assert client.get("a/b c.json") == "one"
    client.put("a/b c.json", "three")  # plain PUT overwrites
    assert client.get("a/b c.json") == "three"


def test_http_basic_roundtrip(tmp_path, http_bucket, monkeypatch):
    _no_posix_atomics(monkeypatch)
    srv, _ = http_bucket
    t = ManagedTable.create(None, tmp_path / "t")
    t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)
    t.append_pylist([{"writer": 1, "seq": 2}], SCHEMA)
    assert t.snapshot().version == 2 and t.snapshot().total_rows == 2
    # the log lives across the socket, not on the filesystem
    assert not list((tmp_path / "t" / "_log").glob("*.json"))
    assert srv.store.get(str(tmp_path / "t" / "_log" / f"{1:020d}.json"))


def test_http_threaded_storm(tmp_path, http_bucket, monkeypatch):
    """N writers x K appends, every CAS a real HTTP round trip: gapless
    versions, zero lost updates."""
    _no_posix_atomics(monkeypatch)
    srv, _ = http_bucket
    root = tmp_path / "t"
    ManagedTable.create(None, root)
    n_threads, n_appends = 5, 4
    errors: list = []

    def worker(wid: int):
        try:
            t = ManagedTable(None, root)
            for i in range(n_appends):
                t.append_pylist([{"writer": wid, "seq": i}], SCHEMA)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=worker, args=(w,)) for w in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    m = ManagedTable(None, root).snapshot()
    assert m.version == n_threads * n_appends
    assert m.total_rows == n_threads * n_appends
    for v in range(m.version + 1):
        assert srv.store.get(str(root / "_log" / f"{v:020d}.json"))


def test_http_lost_ack_recovers_exactly_once(tmp_path, http_bucket,
                                             monkeypatch):
    """The server applies the CAS then kills the connection with no
    status line. The client cannot know the outcome; the protocol's
    recovery read must see our payload and report the win — one commit,
    no retry at the next version."""
    _no_posix_atomics(monkeypatch)
    srv, _ = http_bucket
    t = ManagedTable.create(None, tmp_path / "t")
    srv.faults.drop_after_next_cas = 1
    t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)
    m = t.snapshot()
    assert m.version == 1 and m.total_rows == 1  # exactly once
    t.append_pylist([{"writer": 1, "seq": 2}], SCHEMA)
    assert t.snapshot().total_rows == 2


def test_http_timeout_after_apply_recovers(tmp_path, http_bucket,
                                           monkeypatch):
    """CAS ack delayed past the client timeout: the write APPLIED, the
    socket read timed out — recovery resolves it as a win."""
    from data_warehouse_copy_spark.sources.http_store import HttpObjectStore

    _no_posix_atomics(monkeypatch)
    srv, _ = http_bucket
    slow = HttpObjectStore(srv.port, timeout=0.3)
    cp.register_commit_protocol(
        tmp_path, cp.ConditionalPutCommitProtocol(slow)
    )
    t = ManagedTable.create(None, tmp_path / "t")
    srv.faults.latency_cas_s = 1.0
    try:
        t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)
    finally:
        srv.faults.latency_cas_s = 0.0
    assert t.snapshot().version == 1 and t.snapshot().total_rows == 1


def test_http_pre_apply_503_retries(tmp_path, http_bucket, monkeypatch):
    _no_posix_atomics(monkeypatch)
    srv, _ = http_bucket
    t = ManagedTable.create(None, tmp_path / "t")
    srv.faults.fail_before_next_cas = 2
    t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)
    assert t.snapshot().version == 1 and t.snapshot().total_rows == 1


def test_http_persistent_outage_surfaces(tmp_path, http_bucket, monkeypatch):
    _no_posix_atomics(monkeypatch)
    srv, _ = http_bucket
    t = ManagedTable.create(None, tmp_path / "t")
    srv.faults.fail_before_next_cas = 50
    with pytest.raises(cp.TransientStoreError, match="unavailable"):
        t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)
    srv.faults.fail_before_next_cas = 0
    t.append_pylist([{"writer": 1, "seq": 1}], SCHEMA)  # store recovered
    assert t.snapshot().total_rows == 1


def test_http_storm_with_latency_and_lost_acks(tmp_path, http_bucket,
                                               monkeypatch):
    """The full drill: concurrent writers, global latency, a sprinkle of
    lost CAS acks — still gapless, still exactly-once."""
    _no_posix_atomics(monkeypatch)
    srv, _ = http_bucket
    root = tmp_path / "t"
    ManagedTable.create(None, root)
    srv.faults.latency_s = 0.01
    srv.faults.drop_after_next_cas = 3
    n_threads, n_appends = 4, 3
    errors: list = []

    def worker(wid: int):
        try:
            t = ManagedTable(None, root)
            for i in range(n_appends):
                t.append_pylist([{"writer": wid, "seq": i}], SCHEMA)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=worker, args=(w,)) for w in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    srv.faults.latency_s = 0.0
    assert not errors
    m = ManagedTable(None, root).snapshot()
    assert m.version == n_threads * n_appends
    assert m.total_rows == n_threads * n_appends


def _http_cas_race_worker(args):
    """Top-level (picklable) cross-PROCESS racer over the SOCKET store:
    each process opens its own TCP connections to the shared server."""
    from data_warehouse_copy_spark.sources.http_store import HttpObjectStore

    port, key, payload = args
    s = HttpObjectStore(port)
    won = s.put_if_absent(key, payload)
    seen = s.get(key)
    return won, payload, seen


def test_http_cas_is_atomic_across_processes(http_bucket):
    """The conditional-put CAS over the NETWORK boundary, raced by real
    OS processes — every racer a separate client process with its own
    sockets: exactly one winner per key, every racer's read-after sees
    the winner's complete payload."""
    import multiprocessing as mp

    srv, _ = http_bucket
    n_keys, racers_per_key = 3, 6
    jobs = [
        (srv.port, f"race/k{k}", f"proc{p}-payload-{'x' * 2048}")
        for k in range(n_keys)
        for p in range(racers_per_key)
    ]
    with mp.get_context("fork").Pool(6) as pool:
        results = pool.map(_http_cas_race_worker, jobs)
    by_key: dict = {}
    for (_, key, _pl), (won, payload, seen) in zip(jobs, results):
        by_key.setdefault(key, []).append((won, payload, seen))
    for key, rs in by_key.items():
        winners = [payload for won, payload, _ in rs if won]
        assert len(winners) == 1, key
        assert srv.store.get(key) == winners[0]
        for _, _, seen in rs:
            assert seen == winners[0]
