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
            # prune hidden/metadata DIRECTORIES too (_spark_metadata/,
            # _delta_log/, .crc dirs): their leaf files are often not
            # '_'-prefixed themselves (e.g. _delta_log/000…json) and are
            # never table data
            _dirs[:] = [d for d in _dirs if not d.startswith(("_", "."))]
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

    def _entries(self, table_path: str) -> dict[str, list]:
        """{relative path: [size, mtime_ns]}. Size alone cannot detect a
        size-preserving in-place rewrite (same byte count, different
        rows) — exactly the unsound state the preview guard exists to
        refuse — so the mtime rides along as the cheap content witness
        (a content hash would be exact but costs a full data read,
        defeating the zero-scan contract). Logs written by earlier
        versions store a bare int size; :meth:`_sig` normalizes."""
        out: dict[str, list] = {}
        for root, _dirs, files in os.walk(table_path):
            # prune hidden/metadata directories (see snapshot_id): files
            # under _spark_metadata/ or _delta_log/ are not table data
            # and must never be handed to spark.read.parquet as such
            _dirs[:] = [d for d in _dirs if not d.startswith(("_", "."))]
            for f in sorted(files):
                if f.startswith(("_", ".")):
                    continue
                p = os.path.join(root, f)
                st = os.stat(p)
                out[os.path.relpath(p, table_path)] = [
                    st.st_size, st.st_mtime_ns
                ]
        return out

    @staticmethod
    def _sig(v) -> tuple[int, int | None]:
        """Normalize an entry value: legacy bare size, or
        [size, mtime_ns]."""
        if isinstance(v, (list, tuple)):
            return int(v[0]), (
                int(v[1]) if len(v) > 1 and v[1] is not None else None
            )
        return int(v), None

    @classmethod
    def _differs(cls, a, b) -> bool:
        """True when two entry values witness different file content:
        size mismatch always; mtime mismatch when BOTH sides recorded
        one (a legacy size-only snapshot cannot retro-claim rewrites)."""
        sa, ma = cls._sig(a)
        sb, mb = cls._sig(b)
        if sa != sb:
            return True
        return ma is not None and mb is not None and ma != mb

    @classmethod
    def _same_state(cls, prev_files: dict, entries: dict) -> bool:
        return set(prev_files) == set(entries) and not any(
            cls._differs(entries[p], prev_files[p]) for p in entries
        )

    @classmethod
    def _content_id(cls, entries: dict) -> str:
        lines = sorted(
            f"{p}:{cls._sig(v)[0]}:{cls._sig(v)[1]}"
            for p, v in entries.items()
        )
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
                p for p, v in entries.items()
                if p in prev_f and self._differs(v, prev_f[p])
            ),
            "removed": sorted(p for p in prev_f if p not in entries),
        }

    def pending_id(self, entries: dict) -> str:
        """The snapshot id :meth:`commit` WILL return for ``entries``,
        without writing anything. Lets ``validate_appended`` namespace
        its checkpoint manifest by the snapshot it is validating while
        deferring the commit until validation succeeds — committing
        first would make a killed delta-run invisible (the retry's
        preview would diff against the already-committed state and
        no-op, silently never validating the appended files).
        Single-writer, like the rest of the log: the records cannot
        change between this call and the later commit."""
        records = self._records()
        latest = records[-1] if records else None
        if latest is not None and self._same_state(latest["files"], entries):
            return latest["id"]
        cid = self._content_id(entries)
        seq = len(records)
        return cid if cid not in {r["id"] for r in records} else f"{cid}@{seq}"

    def commit(self, table_path: str, entries: dict | None = None) -> str:
        """Record the table's current state; returns its snapshot id
        (the latest id unchanged when nothing changed — idempotent).
        One directory walk — or zero, when ``entries`` comes from a
        prior :meth:`preview` (the guard and the commit must not race
        a concurrent ingest between two walks)."""
        if entries is None:
            entries = self._entries(table_path)
        records = self._records()
        latest = records[-1] if records else None
        if latest is not None and self._same_state(latest["files"], entries):
            return latest["id"]
        cid = self._content_id(entries)
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

    def files(self, snap: str) -> dict:
        """{relative path: [size, mtime_ns]} of one snapshot (bare
        int size in logs written by earlier versions)."""
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
        """Paths present in both snapshots with different size OR
        mtime — an in-place rewrite; file identity no longer implies
        row identity. (mtime catches the size-preserving rewrite that
        a size-only compare would wave through.)"""
        cur_f = self.files(cur)
        prev_f = self.files(prev)
        return sorted(
            p for p, v in cur_f.items()
            if p in prev_f and self._differs(v, prev_f[p])
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
