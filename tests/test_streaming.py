"""S5/S7 analog: streaming incremental sync — catch-up batches apply
upserts + tombstone deletes through the mutation path; the streaming
checkpoint is the resumable low-watermark (files are not re-applied)."""

import os

import pytest
from pyspark.sql import functions as F

from bright_spark.fixtures import make_repos
from bright_spark.index.builder import build_index
from bright_spark.index.catalog import IndexCatalog
from bright_spark.models import IndexConfig
from bright_spark.query.engine import SearchEngine
from bright_spark.streaming.ingest import StreamingIngestor

SCHEMA = ("repo STRING, path STRING, commit STRING, lang STRING, "
          "content STRING, _deleted BOOLEAN")


def test_streaming_incremental_sync(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    pdf = make_repos(30, 21)
    src = str(base / "src.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    idx = str(base / "idx")
    build_index(spark, spark.read.parquet(src), idx, IndexConfig(id="s"),
                n_build_partitions=4)
    eng = SearchEngine(spark, idx)
    n0 = eng.meta["n_docs"]
    assert n0 == 30

    feed = str(base / "feed")
    os.makedirs(feed, exist_ok=True)
    ing = StreamingIngestor(spark, idx, checkpoint_dir=str(base / "ckpt"))

    # batch 1: one new doc + one updated doc
    new_row = dict(pdf.iloc[0].to_dict())
    new_row.update(commit="a" * 40, content="def streamed_new_doc(): pass",
                   _deleted=None)
    upd_row = dict(pdf.iloc[1].to_dict())
    upd_row.update(content="class StreamedUpdatedDoc: pass", _deleted=None)
    spark.createDataFrame([new_row, upd_row], SCHEMA).write.mode("overwrite") \
        .parquet(os.path.join(feed, "b1"))
    ing.run_available_now(os.path.join(feed, "b1"), SCHEMA)

    eng = SearchEngine(spark, idx)
    assert eng.meta["n_docs"] == 31
    hits = eng.search_df("streamed_new_doc", k=5).collect()
    assert len(hits) == 1
    hits = eng.search_df("streamedupdateddoc", k=5).collect()
    assert len(hits) == 1

    # re-running the same feed is a no-op (checkpoint low-watermark)
    ing.run_available_now(os.path.join(feed, "b1"), SCHEMA)
    eng = SearchEngine(spark, idx)
    assert eng.meta["n_docs"] == 31

    # batch 2: tombstone delete of the updated doc
    tomb = {k: upd_row[k] for k in ("repo", "path", "commit", "lang")}
    tomb.update(content=None, _deleted=True)
    ing2 = StreamingIngestor(spark, idx, checkpoint_dir=str(base / "ckpt2"))
    spark.createDataFrame([tomb], SCHEMA).write.mode("overwrite") \
        .parquet(os.path.join(feed, "b2"))
    ing2.run_available_now(os.path.join(feed, "b2"), SCHEMA)

    eng = SearchEngine(spark, idx)
    assert eng.meta["n_docs"] == 30
    assert eng.search_df("streamedupdateddoc", k=5).count() == 0
    # untouched docs still searchable
    assert eng.search_df("user", k=5).count() > 0


def test_streaming_bulk_tombstones_no_driver_ids(spark, tmp_path_factory):
    """A tombstone burst far beyond driver-list comfort applies through
    delete_where (DataFrame id flow) — and the batch apply must not
    plan the delete ids as literals."""
    base = tmp_path_factory.mktemp("bulkdel")
    rows = [{"repo": f"r{i % 5}", "path": f"p/{i}", "commit": f"c{i}",
             "lang": "python", "content": f"alpha tok{i % 31} beta"}
            for i in range(3000)]
    src = str(base / "src.parquet")
    spark.createDataFrame(rows).write.mode("overwrite").parquet(src)
    idx = str(base / "idx")
    build_index(spark, spark.read.parquet(src), idx, IndexConfig(id="bd"),
                n_build_partitions=4)
    ing = StreamingIngestor(spark, idx, checkpoint_dir=str(base / "ckpt"))

    feed = str(base / "feed")
    tombs = [{"repo": r["repo"], "path": r["path"], "commit": r["commit"],
              "lang": None, "content": None, "_deleted": True}
             for r in rows if int(r["path"].split("/")[1]) % 3 == 0]
    assert len(tombs) == 1000
    spark.createDataFrame(tombs, SCHEMA).write.mode("overwrite") \
        .parquet(os.path.join(feed, "b1"))
    ing.run_available_now(os.path.join(feed, "b1"), SCHEMA)

    eng = SearchEngine(spark, idx)
    assert eng.meta["n_docs"] == 2000
    survivors = {r["path"] for r in
                 eng.catalog.docs(spark).select("path").collect()}
    assert survivors == {r["path"] for r in rows
                         if int(r["path"].split("/")[1]) % 3 != 0}


def test_continuous_trigger_poll_loop(spark, tmp_path_factory):
    """S7 analog: the processing-time trigger is the reference's poll
    loop (ingresses/postgres/config.go:102-117, default 30s; 1s here).
    A batch dropped into the feed is applied without re-invoking the
    job; the caller stops the query."""
    import time

    base = tmp_path_factory.mktemp("cont")
    pdf = make_repos(10, 31)
    src = str(base / "src.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    idx = str(base / "idx")
    build_index(spark, spark.read.parquet(src), idx, IndexConfig(id="c7"),
                n_build_partitions=2)
    feed = str(base / "feed")
    os.makedirs(feed, exist_ok=True)
    ing = StreamingIngestor(spark, idx, checkpoint_dir=str(base / "ckpt"))
    q = ing.start_continuous(feed, SCHEMA, interval="1 seconds")
    try:
        row = dict(pdf.iloc[0].to_dict())
        row.update(commit="b" * 40, content="def polled_new_doc(): pass",
                   _deleted=None)
        # the file source watches the feed dir itself: stage the batch,
        # then drop its part files in (the CDC file-drop pattern)
        import glob
        import shutil
        stage = str(base / "stage_b1")
        spark.createDataFrame([row], SCHEMA).write.mode("overwrite") \
            .parquet(stage)
        for f in glob.glob(os.path.join(stage, "part-*.parquet")):
            shutil.move(f, os.path.join(feed, os.path.basename(f)))
        deadline = time.time() + 120
        ok = False
        while time.time() < deadline:
            eng = SearchEngine(spark, idx)
            if eng.meta["n_docs"] == 11 and \
                    len(eng.search_df("polled_new_doc", k=5).collect()) == 1:
                ok = True
                break
            time.sleep(2)
        assert ok, "continuous trigger never applied the batch"
    finally:
        q.stop()


def test_poll_loop_snapshot_retention_bounded(spark, tmp_path_factory):
    """A perpetual poll loop must not accumulate snapshots without
    bound: the ingestor auto-expires after each batch, keeping
    vacuum_keep, and the live index stays fully queryable."""
    base = tmp_path_factory.mktemp("vac")
    pdf = make_repos(12, 5)
    src = str(base / "src.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    idx = str(base / "idx")
    build_index(spark, spark.read.parquet(src), idx, IndexConfig(id="v"),
                n_build_partitions=2)
    feed = str(base / "feed")
    os.makedirs(feed, exist_ok=True)
    ing = StreamingIngestor(spark, idx, checkpoint_dir=str(base / "ckpt"),
                            vacuum_keep=2)
    for i in range(3):
        row = dict(pdf.iloc[0].to_dict())
        row.update(path=f"gen/new_{i}.py", commit=str(i % 10) * 40,
                   content=f"def vac_marker_{i}(): pass", _deleted=None)
        spark.createDataFrame([row], SCHEMA).write.mode("append").parquet(feed)
        ing.run_available_now(feed, SCHEMA)
    cat = IndexCatalog(idx)
    snaps = cat.snapshots()
    assert len(snaps) <= 2, [m["snapshot_id"] for m in snaps]
    eng = SearchEngine(spark, idx)
    assert eng.meta["n_docs"] == 15
    assert len(eng.search_df("vac_marker_0", k=5).collect()) == 1
    assert len(eng.search_df("vac_marker_2", k=5).collect()) == 1


def test_notify_listener_push_sync(spark, tmp_path_factory):
    """S7 push analog: a notify-channel append (NOT a poll interval)
    triggers the apply; the startup catch-up drains pre-existing
    files, exactly the reference's catch-up-then-listen sequence
    (ingresses/postgres/ingress.go:354-390)."""
    import time

    from bright_spark.streaming.ingest import NotifyListener

    base = tmp_path_factory.mktemp("notify")
    pdf = make_repos(10, 77)
    src = str(base / "src.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    idx = str(base / "idx")
    build_index(spark, spark.read.parquet(src), idx, IndexConfig(id="n7"),
                n_build_partitions=2)
    feed = str(base / "feed")
    os.makedirs(feed, exist_ok=True)

    def drop_batch(i):
        import glob
        import shutil
        row = dict(pdf.iloc[0].to_dict())
        row.update(path=f"gen/notify_{i}.py", commit=str(i % 10) * 40,
                   content=f"def notified_doc_{i}(): pass", _deleted=None)
        stage = str(base / f"stage_{i}")
        spark.createDataFrame([row], SCHEMA).write.mode("overwrite") \
            .parquet(stage)
        for f in glob.glob(os.path.join(stage, "part-*.parquet")):
            shutil.move(f, os.path.join(feed, os.path.basename(f)))

    drop_batch(0)  # lands BEFORE the listener starts -> catch-up sync
    ing = StreamingIngestor(spark, idx, checkpoint_dir=str(base / "ckpt"))
    notify = str(base / "channel")
    lst = NotifyListener(ing, notify, feed, SCHEMA)
    lst.start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if SearchEngine(spark, idx).meta["n_docs"] == 11:
                break
            time.sleep(1)
        assert SearchEngine(spark, idx).meta["n_docs"] == 11  # catch-up

        drop_batch(1)
        with open(notify, "a") as f:       # pg_notify analog
            f.write("INSERT gen/notify_1.py\n")
        deadline = time.time() + 120
        ok = False
        while time.time() < deadline:
            eng = SearchEngine(spark, idx)
            if eng.meta["n_docs"] == 12 and \
                    len(eng.search_df("notified_doc_1", k=5).collect()) == 1:
                ok = True
                break
            time.sleep(1)
        assert ok, "notify never triggered the apply"
        assert lst.syncs_run >= 2
    finally:
        lst.stop()
