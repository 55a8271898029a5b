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
      path + size) as a new snapshot whose id is the same
      content-addressed fingerprint :func:`snapshot_id` computes —
      committing an unchanged table is a no-op returning the
      existing id.
    - :meth:`added_files` diffs two snapshots' file lists — append
      detection with ZERO data scans, the input to
      ``runner.validate_appended`` (validate only the new files).

    Scope: parquet tables grow by adding files; a REWRITTEN file
    (same name, new size) is treated as added (it must be
    revalidated), and deletions are reported by :meth:`removed_files`
    for the caller to decide about. Single-writer (the driver), like
    the manifest."""

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

    def _snap_files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.root)
            if f.startswith("snap-") and f.endswith(".json")
        )

    def snapshots(self) -> list[str]:
        """Snapshot ids in commit order."""
        out = []
        for f in self._snap_files():
            with open(os.path.join(self.root, f), encoding="utf-8") as fh:
                out.append(json.load(fh)["id"])
        return out

    def _read(self, snap: str) -> dict:
        for f in self._snap_files():
            with open(os.path.join(self.root, f), encoding="utf-8") as fh:
                d = json.load(fh)
            if d["id"] == snap:
                return d
        raise KeyError(f"snapshot [{snap}] not in log at {self.root}")

    def commit(self, table_path: str) -> str:
        """Record the table's current state; returns its snapshot id
        (existing id when nothing changed — idempotent)."""
        entries = self._entries(table_path)
        sid = snapshot_id(table_path)
        snaps = self.snapshots()
        if snaps and snaps[-1] == sid:
            return sid
        seq = len(self._snap_files())
        name = os.path.join(self.root, f"snap-{seq:06d}-{sid}.json")
        tmp = name + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {"id": sid, "seq": seq, "table": os.path.abspath(table_path),
                 "files": entries},
                f,
            )
        os.replace(tmp, name)
        return sid

    def files(self, snap: str) -> dict[str, int]:
        """{relative path: size} of one snapshot."""
        return dict(self._read(snap)["files"])

    def added_files(self, prev: str | None, cur: str) -> list[str]:
        """Relative paths present (or resized) in ``cur`` but not in
        ``prev``; ``prev=None`` means everything is new."""
        cur_f = self.files(cur)
        if prev is None:
            return sorted(cur_f)
        prev_f = self.files(prev)
        return sorted(
            p for p, sz in cur_f.items() if prev_f.get(p) != sz
        )

    def removed_files(self, prev: str, cur: str) -> list[str]:
        """Relative paths present in ``prev`` but gone in ``cur`` —
        appends never produce these; a non-empty result means the
        table was rewritten or compacted and a full revalidation is
        the safe call."""
        cur_f = self.files(cur)
        return sorted(p for p in self.files(prev) if p not in cur_f)

    def parent(self, snap: str) -> str | None:
        """The snapshot committed immediately before ``snap``."""
        snaps = self.snapshots()
        i = snaps.index(snap)
        return snaps[i - 1] if i > 0 else None
