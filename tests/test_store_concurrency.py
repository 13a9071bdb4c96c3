"""Store lock-safety — the analog of the reference's ENTIRE test suite
(store/store_test.go: TestConcurrentIndexOperations:12,
TestConcurrentReadsAndWrites:87, TestConcurrentIndexCreationAndDeletion:164,
TestConcurrentBatchOperations:227, TestLockFairnessUnderContention:301,
TestNoDeadlockWithMultipleIndexes:381). The wire surface is a
ThreadingHTTPServer, so every one of these interleavings happens in
production, not just in tests.

Pattern: run the threads, JOIN WITH A TIMEOUT (a deadlock shows up as
a hung join, not a failed assert), then assert the registry and the
indexes are consistent.
"""

import json
import threading

import pytest

from bright_spark.index.store import IndexStore
from bright_spark.models import IndexConfig

JOIN_TIMEOUT = 120  # generous: Spark first-builds ride these threads


def _run_all(threads):
    for t in threads:
        t.start()
    for t in threads:
        t.join(JOIN_TIMEOUT)
    hung = [t.name for t in threads if t.is_alive()]
    assert not hung, f"deadlock / hang: threads still alive: {hung}"


def _rows(lo, hi, tag=""):
    return [{"rid": i, "content": f"doc {tag} number {i} alpha beta"}
            for i in range(lo, hi)]


@pytest.fixture()
def store(spark, tmp_path):
    return IndexStore(spark, str(tmp_path / "cstore"))


def test_concurrent_index_operations(store):
    """store_test.go:12 — distinct ids created/listed/read/deleted from
    many threads at once; every op succeeds and the registry ends
    consistent."""
    errs = []

    def work(i):
        try:
            cid = f"idx{i}"
            store.create_index(IndexConfig(id=cid, tokenizer="simple"))
            assert any(c.id == cid for c in store.list_indexes(limit=100))
            store.get_index(cid)
            if i % 2:
                store.delete_index(cid)
        except Exception as e:  # surfaced after join
            errs.append((i, repr(e)))

    _run_all([threading.Thread(target=work, args=(i,), name=f"w{i}")
              for i in range(16)])
    assert not errs
    survivors = {c.id for c in store.list_indexes(limit=100)}
    assert survivors == {f"idx{i}" for i in range(16) if i % 2 == 0}
    # the persisted registry agrees with the in-memory one
    with open(store.config_file) as f:
        assert set(json.load(f)) == survivors


def test_concurrent_batch_operations(store):
    """store_test.go:227 — parallel document batches against ONE index
    serialize per-index: every row lands exactly once."""
    store.create_index(IndexConfig(id="b", tokenizer="simple"))
    store.add_document_rows("b", _rows(0, 30))  # first batch builds
    errs = []

    def add(lo):
        try:
            store.add_document_rows("b", _rows(lo, lo + 20))
        except Exception as e:
            errs.append(repr(e))

    _run_all([threading.Thread(target=add, args=(lo,), name=f"b{lo}")
              for lo in (100, 200, 300, 400)])
    assert not errs
    resp = store.search("b", "alpha")
    assert resp.total_hits == 30 + 4 * 20


def test_concurrent_reads_and_writes(store):
    """store_test.go:87 — searches run WHILE write batches commit;
    every search sees a consistent snapshot (no errors, monotonically
    growing totals) and the final total is exact."""
    store.create_index(IndexConfig(id="rw", tokenizer="simple"))
    store.add_document_rows("rw", _rows(0, 25))
    errs = []
    per_reader = [[], []]
    stop = threading.Event()

    def reader(mine):
        try:
            while not stop.is_set():
                mine.append(store.search("rw", "alpha").total_hits)
        except Exception as e:
            errs.append(repr(e))

    def writer(lo):
        try:
            store.add_document_rows("rw", _rows(lo, lo + 15))
        except Exception as e:
            errs.append(repr(e))

    readers = [threading.Thread(target=reader, args=(per_reader[i],),
                                name=f"r{i}")
               for i in range(2)]
    writers = [threading.Thread(target=writer, args=(lo,), name=f"wr{lo}")
               for lo in (100, 200, 300)]
    for t in readers:
        t.start()
    _run_all(writers)
    stop.set()
    for t in readers:
        t.join(JOIN_TIMEOUT)
    assert not [t for t in readers if t.is_alive()]
    assert not errs
    assert store.search("rw", "alpha").total_hits == 25 + 3 * 15
    # totals observed mid-flight are each a committed snapshot's count,
    # and each reader saw them monotonically (snapshots never regress)
    valid = {25 + 15 * k for k in range(4)}
    for mine in per_reader:
        assert set(mine) <= valid and mine == sorted(mine)


def test_concurrent_creation_and_deletion(store):
    """store_test.go:164 — create/delete races on a shared id pool:
    losers get the reference's already-exists / 404 errors, never a
    corrupt registry; configs.json stays parseable and in sync."""
    unexpected = []

    def churn(i):
        cid = f"c{i % 4}"  # 16 threads, 4 contended ids
        try:
            if i % 2:
                store.create_index(IndexConfig(id=cid, tokenizer="simple"))
            else:
                store.delete_index(cid)
        except (ValueError, KeyError):
            pass  # exists / not-found: the expected race outcomes
        except Exception as e:
            unexpected.append(repr(e))

    _run_all([threading.Thread(target=churn, args=(i,), name=f"c{i}")
              for i in range(16)])
    assert not unexpected
    with open(store.config_file) as f:
        on_disk = set(json.load(f))
    assert on_disk == {c.id for c in store.list_indexes(limit=100)}
    # a fresh store boots from that registry without error
    rebooted = IndexStore(store.spark, store.data_dir)
    assert {c.id for c in rebooted.list_indexes(limit=100)} == on_disk


def test_lock_fairness_under_contention(store):
    """store_test.go:301 — a long write batch cannot starve registry
    ops: list/get/create of OTHER indexes proceed while one index's
    batch holds its per-index lock."""
    store.create_index(IndexConfig(id="busy", tokenizer="simple"))
    store.add_document_rows("busy", _rows(0, 30))
    done = []

    def long_write():
        store.add_document_rows("busy", _rows(100, 400))
        done.append("write")

    def registry_ops():
        for i in range(20):
            store.create_index(IndexConfig(id=f"q{i}", tokenizer="simple"))
            store.get_index(f"q{i}")
            store.list_indexes(limit=100)
        done.append("registry")

    _run_all([threading.Thread(target=long_write, name="long"),
              threading.Thread(target=registry_ops, name="reg")])
    assert sorted(done) == ["registry", "write"]
    assert store.search("busy", "alpha").total_hits == 330


def test_no_deadlock_with_multiple_indexes(store):
    """store_test.go:381 — threads touching MULTIPLE indexes in
    opposite orders (write a then b vs b then a, plus deletes) must
    not deadlock: lock order is index->registry only, one index lock
    held at a time."""
    for cid in ("a", "b"):
        store.create_index(IndexConfig(id=cid, tokenizer="simple"))
        store.add_document_rows(cid, _rows(0, 20, tag=cid))
    errs = []

    def ab():
        try:
            store.add_document_rows("a", _rows(100, 110, "a"))
            store.add_document_rows("b", _rows(100, 110, "b"))
        except Exception as e:
            errs.append(repr(e))

    def ba():
        try:
            store.add_document_rows("b", _rows(200, 210, "b"))
            store.add_document_rows("a", _rows(200, 210, "a"))
        except Exception as e:
            errs.append(repr(e))

    def churn_c():
        try:
            for _ in range(3):
                store.create_index(IndexConfig(id="c", tokenizer="simple"))
                store.delete_index("c")
        except Exception as e:
            errs.append(repr(e))

    _run_all([threading.Thread(target=ab, name="ab"),
              threading.Thread(target=ba, name="ba"),
              threading.Thread(target=churn_c, name="churn")])
    assert not errs
    assert store.search("a", "alpha").total_hits == 40
    assert store.search("b", "alpha").total_hits == 40
