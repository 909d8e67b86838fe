"""Delta-lite transactional commit log (VERDICT r4 #7) — single-file
JSON manifest with atomic-rename commits, replacing the directory
file-markers (EpochLedger's file-per-epoch, incremental dedup's
``batch=<id>`` listing) as the event store's commit protocol. No jars:
plain JSON + ``os.replace``, the POSIX-atomic primitive.

The contract (the useful subset of a Delta/Iceberg txn log under the
single-writer reality of a foreachBatch driver):

* **Atomic visibility.** Data files are written FIRST (to plain
  parquet dirs), then one manifest entry makes them visible. Readers
  list files from the manifest, never from the directory — a crash
  between data write and commit leaves invisible orphan files, not a
  torn table.
* **Torn-write safety.** The manifest is rewritten to ``.tmp`` and
  ``os.replace``d; a crash mid-write leaves the previous complete
  manifest in place (a dangling ``.tmp`` is ignored and overwritten
  by the next commit).
* **Idempotent epochs.** ``commit`` with an already-committed epoch
  is a no-op — exactly the redelivery discipline
  ``idempotent_foreach_batch`` needs, now holding the epoch *and* its
  file set in one durable record.
* **Compaction manifest.** ``compact`` atomically REPLACES the live
  file set with a snapshot's files while retaining the committed-epoch
  set (so replayed epochs stay no-ops after compaction). A crash after
  the snapshot data is written but before the swap leaves the old
  manifest authoritative; re-running compaction converges.

At 100 TB on a real deployment this file becomes the transaction log
of a table format (Delta/Iceberg); the seam is the four methods below,
and nothing else in the engine reads the directory layout.
"""

from __future__ import annotations

import json
import os

MANIFEST = "_commits.json"
_EMPTY = {"version": 0, "epochs": {}, "files": []}


class CommitLog:
    """Single-file JSON commit log with atomic-rename updates.

    ``epochs`` maps epoch-id (as a string — JSON object keys) to its
    metadata; ``files`` is the live, ordered list of committed data
    paths (parquet files or directories)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, MANIFEST)

    # --- read side ---------------------------------------------------
    def _read(self) -> dict:
        if not os.path.exists(self.path):
            return json.loads(json.dumps(_EMPTY))
        with open(self.path) as fh:
            return json.load(fh)

    def version(self) -> int:
        return self._read()["version"]

    def committed(self, epoch_id: int) -> bool:
        return str(epoch_id) in self._read()["epochs"]

    def files(self) -> list[str]:
        """The live data file set — the ONLY file listing readers use."""
        return list(self._read()["files"])

    def epoch_meta(self, epoch_id: int) -> dict | None:
        return self._read()["epochs"].get(str(epoch_id))

    # --- write side (single writer) ----------------------------------
    def _swap(self, state: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.path)  # atomic on POSIX
        # The rename itself lives in the directory entry: without a
        # directory fsync a post-commit power loss can roll the manifest
        # back to the previous version while the sink write survived —
        # redelivery would then double-write the epoch. fsync the dir to
        # make committed() durable, not merely atomic.
        dir_fd = os.open(self.root, os.O_RDONLY)
        try:
            os.fsync(dir_fd)
        finally:
            os.close(dir_fd)

    def commit(
        self, epoch_id: int, add_files: list[str], meta: dict | None = None
    ) -> bool:
        """Make ``add_files`` visible as epoch ``epoch_id``. Returns
        False (no-op) when the epoch is already committed — the
        redelivered-micro-batch case."""
        state = self._read()
        key = str(epoch_id)
        if key in state["epochs"]:
            return False
        state["version"] += 1
        state["epochs"][key] = {"files": list(add_files), **(meta or {})}
        state["files"].extend(f for f in add_files if f not in state["files"])
        self._swap(state)
        return True

    def compact(self, snapshot_files: list[str], meta: dict | None = None) -> int:
        """Atomically replace the live file set with ``snapshot_files``
        (already written and durable). Committed-epoch ids are KEPT so
        late redeliveries of pre-compaction epochs remain no-ops.
        Returns the new version."""
        state = self._read()
        state["version"] += 1
        state["files"] = list(snapshot_files)
        state["compaction"] = {"version": state["version"], **(meta or {})}
        self._swap(state)
        return state["version"]
