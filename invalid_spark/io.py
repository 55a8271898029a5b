"""Table + snapshot abstraction.

Production target is Iceberg (`spark.read.format("iceberg")`,
snapshot-pinned reads, `writeTo(...).append()`); this sandbox has no
Iceberg jars, so the same contract is provided over parquet
directories plus a JSON manifest:

- :func:`snapshot_id` — deterministic fingerprint of a parquet dir
  (file names + sizes), standing in for an Iceberg snapshot id: a
  resumed run can verify it is reading the same table state it
  checkpointed against.
- :class:`Manifest` — a directory of one JSON file per completed
  work unit. One-file-per-unit makes completion marks atomic at the
  filesystem level (rename semantics), which is exactly what Iceberg
  commit metadata gives us in production; a kill between units never
  corrupts the manifest.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Iterable


def snapshot_id(path: str) -> str:
    """Deterministic fingerprint of a parquet directory or file."""
    entries = []
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.startswith(("_", ".")):
                    continue
                p = os.path.join(root, f)
                entries.append(f"{os.path.relpath(p, path)}:{os.path.getsize(p)}")
    elif os.path.exists(path):
        entries.append(f"{os.path.basename(path)}:{os.path.getsize(path)}")
    h = hashlib.md5("\n".join(sorted(entries)).encode()).hexdigest()
    return h[:16]


class Manifest:
    """Checkpoint manifest: one JSON file per completed unit."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, unit: str) -> str:
        safe = hashlib.md5(str(unit).encode()).hexdigest()[:24]
        return os.path.join(self.root, f"unit-{safe}.json")

    def mark_done(self, unit: str, meta: dict | None = None) -> None:
        tmp = self._path(unit) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"unit": str(unit), **(meta or {})}, f)
        os.replace(tmp, self._path(unit))  # atomic on POSIX

    def is_done(self, unit: str) -> bool:
        return os.path.exists(self._path(unit))

    def done_units(self) -> set[str]:
        out = set()
        for f in os.listdir(self.root):
            if f.startswith("unit-") and f.endswith(".json"):
                with open(os.path.join(self.root, f), encoding="utf-8") as fh:
                    out.add(json.load(fh)["unit"])
        return out

    def read_meta(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.root)):
            if f.startswith("unit-") and f.endswith(".json"):
                with open(os.path.join(self.root, f), encoding="utf-8") as fh:
                    out.append(json.load(fh))
        return out


class TableLog:
    """Append-only SNAPSHOT LOG over a parquet directory — the
    file-level half of the Iceberg-metadata stand-in (the
    :class:`Manifest` is the commit-atomicity half). Iceberg answers
    "which files did snapshot B add over snapshot A?" from its
    manifest lists without touching data; ``TableLog`` provides the
    same contract from a JSON log:

    - :meth:`commit` records the table's current file list (relative
      path + size) as a new snapshot in ONE directory walk — the
      snapshot id is content-addressed FROM that same list, so the
      recorded files and the id can never disagree (a second
      independent walk could race a concurrent ingest). Committing an
      unchanged table is a no-op returning the latest id; re-creating
      a PREVIOUS state (files deleted back) gets a seq-disambiguated
      id so the parent chain stays unambiguous and the removal is
      visible to :meth:`removed_files`.
    - each snapshot records its ``parent`` explicitly — lineage never
      depends on id uniqueness or list ordering.
    - :meth:`added_files` / :meth:`changed_files` /
      :meth:`removed_files` diff two snapshots' file lists — append
      detection with ZERO data scans, the input to
      ``runner.validate_appended`` (which refuses changed/removed
      files: after a rewrite or compaction, file identity no longer
      implies row identity).

    Single-writer (the driver), like the manifest."""

    def __init__(self, log_dir: str):
        self.root = log_dir
        os.makedirs(log_dir, exist_ok=True)

    def _entries(self, table_path: str) -> dict[str, int]:
        out: dict[str, int] = {}
        for root, _dirs, files in os.walk(table_path):
            for f in sorted(files):
                if f.startswith(("_", ".")):
                    continue
                p = os.path.join(root, f)
                out[os.path.relpath(p, table_path)] = os.path.getsize(p)
        return out

    @staticmethod
    def _content_id(entries: dict[str, int]) -> str:
        lines = sorted(f"{p}:{sz}" for p, sz in entries.items())
        return hashlib.md5("\n".join(lines).encode()).hexdigest()[:16]

    def _snap_files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.root)
            if f.startswith("snap-") and f.endswith(".json")
        )

    def _records(self) -> list[dict]:
        out = []
        for f in self._snap_files():
            with open(os.path.join(self.root, f), encoding="utf-8") as fh:
                out.append(json.load(fh))
        return out

    def snapshots(self) -> list[str]:
        """Snapshot ids in commit order."""
        return [r["id"] for r in self._records()]

    def _read(self, snap: str) -> dict:
        for r in self._records():
            if r["id"] == snap:
                return r
        raise KeyError(f"snapshot [{snap}] not in log at {self.root}")

    def preview(self, table_path: str) -> dict:
        """Diff the table's CURRENT state against the latest snapshot
        WITHOUT committing: ``{entries, parent, added, changed,
        removed}``. The soundness guard runs on this — an unsound
        state (changed/removed files) must be refused BEFORE it is
        recorded, or it would become the next run's baseline and the
        refusal would fire exactly once. Pass ``entries`` back to
        :meth:`commit` so the guard and the commit see the same walk."""
        entries = self._entries(table_path)
        records = self._records()
        latest = records[-1] if records else None
        if latest is None:
            return {"entries": entries, "parent": None,
                    "added": sorted(entries), "changed": [], "removed": []}
        prev_f = latest["files"]
        return {
            "entries": entries,
            "parent": latest["id"],
            "added": sorted(p for p in entries if p not in prev_f),
            "changed": sorted(
                p for p, sz in entries.items()
                if p in prev_f and prev_f[p] != sz
            ),
            "removed": sorted(p for p in prev_f if p not in entries),
        }

    def commit(self, table_path: str, entries: dict | None = None) -> str:
        """Record the table's current state; returns its snapshot id
        (the latest id unchanged when nothing changed — idempotent).
        One directory walk — or zero, when ``entries`` comes from a
        prior :meth:`preview` (the guard and the commit must not race
        a concurrent ingest between two walks)."""
        if entries is None:
            entries = self._entries(table_path)
        cid = self._content_id(entries)
        records = self._records()
        latest = records[-1] if records else None
        if latest is not None and latest["id"].split("@")[0] == cid and \
                latest["files"] == entries:
            return latest["id"]
        seq = len(records)
        # a revert to an EARLIER state re-uses its content hash but
        # must be a distinct snapshot (unique id, correct parent) —
        # disambiguate with the sequence number
        sid = cid if cid not in {r["id"] for r in records} else f"{cid}@{seq}"
        name = os.path.join(self.root, f"snap-{seq:06d}-{cid}.json")
        tmp = name + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {"id": sid, "seq": seq,
                 "parent": latest["id"] if latest else None,
                 "table": os.path.abspath(table_path),
                 "files": entries},
                f,
            )
        os.replace(tmp, name)
        return sid

    def files(self, snap: str) -> dict[str, int]:
        """{relative path: size} of one snapshot."""
        return dict(self._read(snap)["files"])

    def added_files(self, prev: str | None, cur: str) -> list[str]:
        """Relative paths present in ``cur`` but absent from ``prev``;
        ``prev=None`` means everything is new. Size-changed existing
        paths are NOT added — they are :meth:`changed_files` (a
        rewrite, which append-level validation must refuse)."""
        cur_f = self.files(cur)
        if prev is None:
            return sorted(cur_f)
        prev_f = self.files(prev)
        return sorted(p for p in cur_f if p not in prev_f)

    def changed_files(self, prev: str, cur: str) -> list[str]:
        """Paths present in both snapshots with DIFFERENT sizes — an
        in-place rewrite; file identity no longer implies row
        identity."""
        cur_f = self.files(cur)
        prev_f = self.files(prev)
        return sorted(
            p for p, sz in cur_f.items()
            if p in prev_f and prev_f[p] != sz
        )

    def removed_files(self, prev: str, cur: str) -> list[str]:
        """Relative paths present in ``prev`` but gone in ``cur`` —
        appends never produce these; non-empty means a rewrite or
        compaction."""
        cur_f = self.files(cur)
        return sorted(p for p in self.files(prev) if p not in cur_f)

    def parent(self, snap: str) -> str | None:
        """The snapshot this one was committed on top of (recorded
        explicitly at commit time)."""
        return self._read(snap).get("parent")
