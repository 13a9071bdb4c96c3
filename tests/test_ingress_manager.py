"""Ingress registry + lifecycle (ingresses/manager.go, ingress.go):
create/get/list/update/delete over a persisted ingresses.json; the
filedrop ingress syncs changefeed batches with reference Statistics,
pause blocks application, resume drains, resync re-ingests from a
fresh checkpoint, and a rebooted manager reloads its registry."""

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bright_spark.index.store import IndexStore
from bright_spark.models import IndexConfig
from bright_spark.streaming.manager import IngressManager

SCHEMA = "rid BIGINT, text STRING, kind STRING, _deleted BOOLEAN"


def _batch(spark, path, name, rows):
    """Land one changefeed batch as a FLAT file in the feed dir (the
    file-source stream watches files, not subdirectories)."""
    import glob
    import shutil
    tmp = os.path.join(path, f".tmp_{name}")
    df = spark.createDataFrame(pd.DataFrame(rows), SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.rename(part, os.path.join(path, f"{name}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.fixture()
def setup(spark, tmp_path_factory):
    data = str(tmp_path_factory.mktemp("ingm") / "data")
    feed = str(tmp_path_factory.mktemp("ingm") / "feed")
    os.makedirs(feed)
    store = IndexStore(spark, data)
    store.create_index(IndexConfig(id="docs", tokenizer="simple",
                                   n_term_buckets=4))
    store.add_documents("docs", spark.createDataFrame(pd.DataFrame([
        {"rid": i, "text": f"base doc {i} alpha", "kind": "k"}
        for i in range(10)])), content_col="text", lang_col=None)
    return store, data, feed


def _count(store):
    return store.engine("docs").catalog.docs(
        store.spark).count()


def test_lifecycle_and_statistics(spark, setup):
    store, data, feed = setup
    mgr = IngressManager(spark, data)
    ing = mgr.create("docs", "feed1",
                     {"source_dir": feed, "schema_ddl": SCHEMA})
    assert ing.status == "stopped"
    assert mgr.list("docs")[0]["id"] == "feed1"

    # one drop: 3 upserts (1 replacement + 2 new) + 1 tombstone
    _batch(spark, feed, "b1", [
        {"rid": 0, "text": "replaced doc zero", "kind": "k",
         "_deleted": None},
        {"rid": 100, "text": "fresh one hundred", "kind": "k",
         "_deleted": None},
        {"rid": 101, "text": "fresh one oh one", "kind": "k",
         "_deleted": None},
        {"rid": 3, "text": None, "kind": None, "_deleted": True},
    ])
    ing.sync_once()
    st = ing.info()["statistics"]
    assert st["documents_synced"] == 3
    assert st["documents_deleted"] == 1
    assert st["full_sync_complete"] and st["last_sync_at"]
    store._engines.pop("docs", None)  # drop pre-sync pinned engine
    assert _count(store) == 11  # 10 + 2 new - 1 deleted
    assert ing.status == "stopped"  # sync_once keeps prior state

    # checkpointed: a second pass with nothing new applies nothing
    ing.sync_once()
    assert ing.info()["statistics"]["documents_synced"] == 3

    # resync: full re-ingest from scratch, idempotent end state
    ing.resync()
    st = ing.info()["statistics"]
    assert st["documents_synced"] == 6 and st["documents_deleted"] == 2
    store._engines.pop("docs", None)
    assert _count(store) == 11

    # registry reboot: fresh manager reloads the config, stopped
    mgr2 = IngressManager(spark, data)
    assert mgr2.get("feed1").status == "stopped"
    assert mgr2.get("feed1").cfg.config["source_dir"] == feed

    # update requires stopped; delete removes registration
    mgr2.update("feed1", {"source_dir": feed, "schema_ddl": SCHEMA,
                          "interval_s": 1.0})
    mgr2.delete("feed1")
    with pytest.raises(KeyError):
        mgr2.get("feed1")
    assert IngressManager(spark, data).list() == []


def test_pause_resume_threaded(spark, setup):
    store, data, feed = setup
    mgr = IngressManager(spark, data)
    ing = mgr.create("docs", "feed2",
                     {"source_dir": feed, "schema_ddl": SCHEMA,
                      "interval_s": 0.3})
    _batch(spark, feed, "b1", [
        {"rid": 200, "text": "first live row", "kind": "k",
         "_deleted": None}])
    ing.start()
    try:
        deadline = time.time() + 90
        while (ing.info()["statistics"]["documents_synced"] < 1
               and time.time() < deadline):
            time.sleep(0.3)
        assert ing.info()["statistics"]["documents_synced"] == 1
        assert ing.status in ("running", "syncing")

        # pause() fences: it returns only after any in-flight pass
        # finished and no new pass can start, so the counter read here
        # is final and a batch dropped now can NEVER be applied
        ing.pause()
        synced_at_pause = ing.info()["statistics"]["documents_synced"]
        _batch(spark, feed, "b2", [
            {"rid": 201, "text": "second live row", "kind": "k",
             "_deleted": None}])
        time.sleep(2.0)
        assert ing.info()["statistics"]["documents_synced"] == \
            synced_at_pause
        assert ing.status == "paused"

        ing.resume()
        deadline = time.time() + 90
        while (ing.info()["statistics"]["documents_synced"]
               < synced_at_pause + 1 and time.time() < deadline):
            time.sleep(0.3)
        assert ing.info()["statistics"]["documents_synced"] == \
            synced_at_pause + 1
    finally:
        ing.stop()
    assert ing.status == "stopped"
