"""Revision-pinned persistence: named state snapshots you can restore *to*.

≙ reference ``persist() -> revision`` / ``restore_revision(rev)``
(``src/core/eventflux_manager.rs:487-529`` ``persist_app`` /
``restore_app_revision``; behavior pinned by
``tests/app_runner_persistence.rs`` and ``tests/persistence.rs``): a
revision captures EVERY stateful component atomically; restoring rolls the
runtime back to exactly that point, and replaying the input tail after a
restore produces no duplicates and no loss.

Spark mapping — a running pipeline's durable state is exactly two things:

1. the Structured Streaming **checkpoint** (source offsets + operator
   state), and
2. each sink's **committed-epoch set** (the exactly-once commit markers of
   ``ExactlyOnceParquetSink``).

``persist()`` therefore snapshots the checkpoint directory and records each
sink's committed epochs in a revision manifest. ``restore_revision()``
resets the checkpoint to the pinned copy and rolls each sink back to the
manifest's epoch set — dropping later commit markers AND their epoch data
dirs, so the replayed tail rewrites them idempotently (the sink's
epoch-keyed overwrite-then-mark protocol makes replay exactly-once, see
``streaming/sink.py``). A restore in a FRESH process (the reference's
manager-restart test, ``persist_shutdown_restore_state``) works the same
way: the revision store is plain files, shared like the reference's
persistence store trait.
"""

from __future__ import annotations

import json
import os
import shutil

from .sink import ExactlyOnceParquetSink


class RevisionStore:
    """File-backed revision store (≙ ``InMemoryPersistenceStore`` /
    ``FilePersistenceStore`` behind the reference's PersistenceStore trait).
    One instance manages the revisions of one app: a checkpoint location
    plus the app's sinks."""

    def __init__(
        self,
        root: str,
        checkpoint_dir: str,
        sinks: dict[str, ExactlyOnceParquetSink],
    ):
        self.root = root
        self.checkpoint_dir = checkpoint_dir
        self.sinks = dict(sinks)
        os.makedirs(self.root, exist_ok=True)

    # -- persist ----------------------------------------------------------

    def revisions(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.exists(os.path.join(self.root, d, "manifest.json"))
        )

    def persist(self) -> str:
        """Snapshot checkpoint + sink high-water marks; returns the revision
        id. Call with the streaming query STOPPED (the reference persists on
        a barrier through its snapshot service too — no torn state)."""
        revs = self.revisions()
        # next id = max existing + 1, NOT the count: deleting an
        # intermediate revision must never make a later persist collide
        # with a surviving directory (os.rename would fail)
        nxt = 1 + max(
            (int(r.split("-")[1]) for r in revs), default=-1
        )
        rev = f"rev-{nxt:05d}"
        rev_dir = os.path.join(self.root, rev)
        staged = rev_dir + ".tmp"
        shutil.rmtree(staged, ignore_errors=True)
        os.makedirs(staged)
        if os.path.isdir(self.checkpoint_dir):
            shutil.copytree(
                self.checkpoint_dir, os.path.join(staged, "checkpoint")
            )
        manifest = {
            "revision": rev,
            "sinks": {
                name: {"epochs": s.committed_epochs()}
                for name, s in self.sinks.items()
            },
        }
        with open(os.path.join(staged, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        os.rename(staged, rev_dir)  # atomic publish: manifest + checkpoint
        return rev

    # -- restore ----------------------------------------------------------

    def restore_revision(self, rev: str) -> None:
        """Roll the checkpoint and every sink back to the revision. Later
        epochs lose their commit markers and data, so a restarted query
        replays them from the source — exactly once."""
        rev_dir = os.path.join(self.root, rev)
        mpath = os.path.join(rev_dir, "manifest.json")
        if not os.path.exists(mpath):
            raise ValueError(
                f"unknown revision {rev!r}; have: {self.revisions()}"
            )
        with open(mpath) as f:
            manifest = json.load(f)
        # checkpoint: reset to the pinned copy (absent in the manifest =
        # the app had not started when persisted -> clean slate)
        shutil.rmtree(self.checkpoint_dir, ignore_errors=True)
        pinned = os.path.join(rev_dir, "checkpoint")
        if os.path.isdir(pinned):
            shutil.copytree(pinned, self.checkpoint_dir)
        for name, info in manifest["sinks"].items():
            if name not in self.sinks:
                raise ValueError(f"revision {rev} names unknown sink {name!r}")
            self._truncate_sink(self.sinks[name], set(info["epochs"]))

    @staticmethod
    def _truncate_sink(sink: ExactlyOnceParquetSink, keep: set[int]) -> None:
        for e in sink.committed_epochs():
            if e in keep:
                continue
            os.remove(sink._commit_path(e))  # marker first: epoch invisible
            shutil.rmtree(
                os.path.join(sink.data_dir, f"epoch={e}"), ignore_errors=True
            )
            shutil.rmtree(
                os.path.join(sink.dlq_dir, f"epoch={e}"), ignore_errors=True
            )
