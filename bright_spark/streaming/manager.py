"""Ingress registry + lifecycle — the manager layer over the sync
engine (reference: ``ingresses/ingress.go`` interface + Statistics,
``ingresses/manager.go`` Load/save/Create/Get/List/Update/Delete with
an ``ingresses.json`` registry).

The only ingress type in this environment is ``filedrop`` — the
Postgres-CDC analog the streaming module uses throughout (a changefeed
directory of parquet batches with ``_deleted`` tombstones; the sandbox
has no Postgres). Lifecycle mirrors the reference state machine:

    stopped -> (start) -> running <-> (pause/resume) -> paused
    running -> syncing during a pass; failed on error
    resync() = full re-ingest from a fresh checkpoint (idempotent:
    re-applied batches upsert by the same keys — the analog of the
    reference's full-table resynchronization, ingress.go:58-60)

Statistics mirror ``ingresses/ingress.go:21-29``: last_sync_at,
documents_synced, documents_deleted, full_sync_complete, last_error,
error_count.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import functions as F

from bright_spark.streaming.ingest import DELETED_COL, StreamingIngestor


@dataclass
class IngressStatistics:
    last_sync_at: str | None = None
    documents_synced: int = 0
    documents_deleted: int = 0
    full_sync_complete: bool = False
    last_error: str | None = None
    error_count: int = 0


@dataclass
class IngressConfig:
    id: str
    index_id: str
    type: str = "filedrop"
    config: dict = field(default_factory=dict)  # source_dir, schema_ddl,
    #                                             interval_s


class FileIngress:
    """One registered changefeed-directory sync (type 'filedrop')."""

    def __init__(self, spark, cfg: IngressConfig, index_dir: str):
        self.spark = spark
        self.cfg = cfg
        self.index_dir = index_dir
        self.status = "stopped"
        self.stats = IngressStatistics()
        self._stop = threading.Event()
        self._paused = threading.Event()
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()
        self._ingestor = StreamingIngestor(
            spark, index_dir,
            checkpoint_dir=os.path.join(index_dir,
                                        f"ingress_ckpt_{cfg.id}"))

    # ------------------------------------------------------- sync core

    def _counted_apply(self, batch, batch_id: int) -> None:
        # ONE aggregation pass for the stats split (total + tombstone
        # count together), not two separate count() jobs per micro-batch
        if DELETED_COL in batch.columns:
            row = batch.agg(
                F.count("*").alias("n"),
                F.sum(F.when(F.col(DELETED_COL) == True, 1)  # noqa: E712
                      .otherwise(0)).alias("d")).collect()[0]
            n_total, n_del = int(row["n"]), int(row["d"] or 0)
        else:
            n_total, n_del = batch.count(), 0
        self._ingestor.apply_batch(batch, batch_id)
        self.stats.documents_synced += n_total - n_del
        self.stats.documents_deleted += n_del

    def sync_once(self) -> None:
        """One catch-up pass (the reference poll cycle): drain every
        unseen changefeed file through the checkpointed stream."""
        with self._lock:
            self._sync_once_locked()

    def _sync_once_locked(self) -> None:
        prev = self.status
        self.status = "syncing"
        try:
            stream = (self.spark.readStream
                      .schema(self.cfg.config["schema_ddl"])
                      .parquet(self.cfg.config["source_dir"]))
            q = (stream.writeStream
                 .foreachBatch(self._counted_apply)
                 .option("checkpointLocation",
                         self._ingestor.checkpoint_dir)
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination()
            self.stats.last_sync_at = time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
            self.stats.full_sync_complete = True
            self.stats.last_error = None
            # a successful pass RECOVERS from 'failed' (otherwise
            # status would stick at failed forever — and update()
            # could then mutate config under a live poll loop)
            if prev in ("running", "paused"):
                self.status = prev
            elif self._thread is not None and self._thread.is_alive():
                self.status = "running"
            else:
                self.status = "stopped"
        except Exception as e:  # failed state, error surfaced
            self.stats.last_error = str(e)
            self.stats.error_count += 1
            self.status = "failed"
            raise

    # ------------------------------------------------------- lifecycle

    def start(self) -> None:
        if self._thread is not None and self._thread.is_alive():
            return
        self._stop.clear()
        self._paused.clear()
        self.status = "running"
        interval = float(self.cfg.config.get("interval_s", 5.0))

        def loop() -> None:
            while not self._stop.is_set():
                # paused-check and sync start are atomic under the
                # lock: pause() sets the flag THEN acquires the lock,
                # so once pause() returns no pass is running and none
                # can start — a batch landing "while paused" can never
                # be applied by a straggler pass
                try:
                    with self._lock:
                        if (not self._paused.is_set()
                                and not self._stop.is_set()):
                            self._sync_once_locked()
                except Exception:
                    pass  # status/stats already record the failure
                if self.status == "syncing":
                    self.status = "running"
                self._stop.wait(interval)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self, timeout: float = 120.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=timeout)
            self._thread = None
        self.status = "stopped"

    def pause(self) -> None:
        """Returns only after any in-flight pass has finished: the
        flag blocks new passes, the lock acquisition waits out the
        current one (Pause() in the reference likewise fences the poll
        loop, ingresses/postgres/ingress.go)."""
        self._paused.set()
        with self._lock:
            pass
        if self.status in ("running", "syncing"):
            self.status = "paused"

    def resume(self) -> None:
        self._paused.clear()
        if self.status == "paused":
            self.status = "running"

    def resync(self) -> None:
        """Full resynchronization: discard the checkpoint (every
        changefeed file becomes unseen again) and run one pass.
        Idempotent — re-applied batches upsert the same keys. The
        discard happens under the sync lock: an in-flight poll pass
        cannot rewrite checkpoint state after the rmtree and silently
        shrink the re-ingest."""
        with self._lock:
            shutil.rmtree(self._ingestor.checkpoint_dir,
                          ignore_errors=True)
            self.stats.full_sync_complete = False
            self._sync_once_locked()

    def info(self) -> dict:
        """IngressInfo analog (ingress.go:76-94)."""
        return {"id": self.cfg.id, "index_id": self.cfg.index_id,
                "type": self.cfg.type, "status": self.status,
                "config": dict(self.cfg.config),
                "statistics": asdict(self.stats)}


class IngressManager:
    """Registry + lifecycle owner (manager.go:20-155): configs persist
    in ``<data_dir>/ingresses.json`` and reload at boot (stopped)."""

    def __init__(self, spark, data_dir: str):
        self.spark = spark
        self.data_dir = data_dir
        self.registry_file = os.path.join(data_dir, "ingresses.json")
        os.makedirs(data_dir, exist_ok=True)
        self._ingresses: dict[str, FileIngress] = {}
        self._load()

    def _index_dir(self, index_id: str) -> str:
        return os.path.join(self.data_dir, index_id)

    def _load(self) -> None:
        if not os.path.exists(self.registry_file):
            return
        try:
            with open(self.registry_file) as f:
                raw = json.load(f)
        except (OSError, ValueError):
            return
        for iid, c in raw.items():
            cfg = IngressConfig(**c)
            self._ingresses[iid] = FileIngress(
                self.spark, cfg, self._index_dir(cfg.index_id))

    def _save(self) -> None:
        with open(self.registry_file, "w") as f:
            json.dump({i: asdict(ing.cfg)
                       for i, ing in self._ingresses.items()}, f, indent=2)

    # ------------------------------------------------------------- api

    def create(self, index_id: str, ingress_id: str,
               config: dict, ingress_type: str = "filedrop") -> FileIngress:
        if ingress_type != "filedrop":
            raise ValueError(f"unknown ingress type {ingress_type!r} "
                             f"(this environment has no Postgres; "
                             f"'filedrop' is the CDC analog)")
        if ingress_id in self._ingresses:
            raise ValueError(f"ingress {ingress_id} already exists")
        if not os.path.isdir(self._index_dir(index_id)):
            raise KeyError(f"index {index_id} not found under "
                           f"{self.data_dir}")
        cfg = IngressConfig(id=ingress_id, index_id=index_id,
                            type=ingress_type, config=dict(config))
        ing = FileIngress(self.spark, cfg, self._index_dir(index_id))
        self._ingresses[ingress_id] = ing
        self._save()
        return ing

    def get(self, ingress_id: str) -> FileIngress:
        if ingress_id not in self._ingresses:
            raise KeyError(f"ingress {ingress_id} not found")
        return self._ingresses[ingress_id]

    def list(self, index_id: str | None = None) -> list[dict]:
        out = [ing.info() for _, ing in sorted(self._ingresses.items())
               if index_id is None or ing.cfg.index_id == index_id]
        return out

    def update(self, ingress_id: str, config: dict) -> FileIngress:
        ing = self.get(ingress_id)
        # status alone is not enough: a 'failed' ingress's poll thread
        # is typically still alive (retrying), and swapping config
        # under a live loop lets the next pass silently run against it
        # — require the thread to actually be dead
        alive = ing._thread is not None and ing._thread.is_alive()
        if ing.status not in ("stopped", "failed") or alive:
            raise ValueError("stop the ingress before updating its config")
        ing.cfg.config = dict(config)
        self._save()
        return ing

    def delete(self, ingress_id: str) -> None:
        ing = self.get(ingress_id)
        ing.stop()
        shutil.rmtree(ing._ingestor.checkpoint_dir, ignore_errors=True)
        del self._ingresses[ingress_id]
        self._save()
