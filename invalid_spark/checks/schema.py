"""Schema-change detection across snapshots (the metadata sibling of
the drift stage): a table whose SCHEMA silently changed — a column
added, dropped, retyped, or relaxed to nullable — is as much a
validation failure as drifted values, and catching it costs ZERO
scans (Spark schemas are driver-side metadata).

The runner stores the schema fingerprint with the drift state and
emits one row per difference on the next snapshot's run:
``(col_name, change, before, after)`` with ``change`` in
{added, removed, type_changed, nullability_changed}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def schema_fingerprint(df: DataFrame) -> list[dict]:
    """Ordered, JSON-serializable schema description."""
    return [
        {
            "col": f.name,
            "type": f.dataType.simpleString(),
            "nullable": bool(f.nullable),
        }
        for f in df.schema.fields
    ]


def schema_changes(
    current: list[dict], stored: list[dict]
) -> list[tuple[str, str, str | None, str | None]]:
    """Differences between two fingerprints, stored → current:
    (col_name, change, before, after). Column ORDER changes are not
    flagged — columnar readers address fields by name."""
    cur = {c["col"]: c for c in current}
    old = {c["col"]: c for c in stored}
    out: list[tuple[str, str, str | None, str | None]] = []
    for name in sorted(set(cur) | set(old)):
        c, o = cur.get(name), old.get(name)
        if o is None:
            out.append((name, "added", None, c["type"]))
        elif c is None:
            out.append((name, "removed", o["type"], None))
        else:
            if c["type"] != o["type"]:
                out.append((name, "type_changed", o["type"], c["type"]))
            if c["nullable"] != o["nullable"]:
                out.append(
                    (
                        name,
                        "nullability_changed",
                        str(o["nullable"]).lower(),
                        str(c["nullable"]).lower(),
                    )
                )
    return out
