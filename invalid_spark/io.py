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
