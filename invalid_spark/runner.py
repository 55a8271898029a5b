"""Stage orchestration: one rule file → all check stages → violation /
verdict / metrics sinks, resumable from a checkpoint manifest.

Lifecycle (the Spark re-expression of the reference's
``NewRule``/``Validate`` pair, SURVEY.md §3):

1. rules load + compile on the driver (:mod:`invalid_spark.dsl` →
   :func:`invalid_spark.checks.rows.compile_row_checks`); DSL errors
   surface here, never on executors (reference ``NewRule`` parity);
2. the row-check plan also yields the table-scale directives
   (``$unique`` / ``$ref`` / ``$stats`` / ``$drift`` / ``$pixel`` /
   ``$caption-eq``) which become the aggregate / join / UDF stages;
3. stages run over the input restricted to NOT-yet-done work units
   (see below), violations union into one DataFrame written per unit;
   verdicts + metrics aggregate from the written violations;
4. each completed unit is marked in the :class:`~invalid_spark.io.
   Manifest` AFTER its outputs are written — a kill mid-run loses at
   most the in-flight unit, and the re-run recomputes exactly that.

**Work units**: the values of ``partition_col`` (a data column — at
production scale the Iceberg partition key, e.g. a date bucket or
shard id), processed in batches of ``unit_batch`` values per Spark
job. Batching keeps cluster parallelism high (one job covers many
units — each unit is NOT a separate tiny job) while bounding how much
work a crash can lose. With no ``partition_col`` the whole table is
one unit (still resumable at the run level).

Every output row carries lineage: ``run_id``, ``snapshot_id`` of the
input (Iceberg snapshot in production; a content fingerprint here),
and the unit value.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from invalid_spark import report
from invalid_spark.checks import drift as drift_checks
from invalid_spark.checks import image as image_checks
from invalid_spark.checks import refint, stats, unique
from invalid_spark.checks import rows as rowchecks
from invalid_spark.dsl import RuleSet
from invalid_spark.io import Manifest, snapshot_id

# Work-unit name for rows whose partition_col is NULL. A bare
# cast-to-string + isin() silently drops NULL rows (NULL.isin → NULL)
# — in a validation engine the dirty rows are the point, so NULLs get
# their own explicit unit on both the distinct() and slice-filter
# sides. (A partition column whose STRING value is literally
# "__null__" would merge with the NULL unit — both slices are still
# validated, they just share one unit/verdict row.)
NULL_UNIT = "__null__"


def _unit_expr(col: str) -> Column:
    return F.coalesce(F.col(col).cast("string"), F.lit(NULL_UNIT))


@dataclass
class RunResult:
    run_id: str
    snapshot: str
    out_dir: str
    units_done: list[str] = field(default_factory=list)
    units_skipped: list[str] = field(default_factory=list)
    # True when the run aborted on a schema-level keyMissing (reference
    # context-cancel): only the schema violation was written, no
    # verdicts — consumers must not infer this from sink emptiness (a
    # legitimately empty table also yields zero verdict rows)
    fail_fast: bool = False
    # True when EVERY expected unit (partition batches + the global
    # uniqueness/fd/monotonic/... stages) is marked done — the signal
    # validate_appended gates its TableLog commit on (a max_batches-
    # bounded partial run must leave the snapshot pending)
    complete: bool = False
    # "" for a normal run; "row_diff_fallback" when validate_appended
    # degraded from file-level to row-level delta after a rewrite
    mode: str = ""

    def violations(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "violations"))

    def verdicts(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "verdicts"))

    def metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "metrics"))

    def assertions(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "assertions"))

    def schema_changes(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self.out_dir, "schema_changes")
        )

    def anomalies(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "anomalies"))

    def distributions(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self.out_dir, "distribution")
        )

    def metrics_history(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self.out_dir, "metrics_history")
        )

    def clean(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "clean"))

    def quarantined(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "quarantine"))


def _bloom_key(col: str, spec: dict) -> tuple:
    return (
        spec.get("table"),
        spec.get("key", col),
        int(spec.get("bits", 1 << 20)),
        int(spec.get("hashes", 3)),
    )


def _prep_blooms(
    plan: rowchecks.RowCheckPlan, dims: dict[str, DataFrame]
) -> dict[tuple, DataFrame]:
    """Materialize each distinct Bloom screen ONCE per run (eager
    localCheckpoint): without this, every unit batch AND each of the
    k broadcast joins would re-execute the dimension fold. The
    checkpoint blocks are ≤ m/32 rows and reclaimed by the
    ContextCleaner when the run's frames go out of scope."""
    blooms: dict[tuple, DataFrame] = {}
    for col, spec in plan.ref_specs:
        if spec.get("mode") != "bloom" or spec.get("table") not in dims:
            continue
        key = _bloom_key(col, spec)
        if key not in blooms:
            blooms[key] = refint.bloom_build(
                dims[key[0]], key[1], m_bits=key[2], k=key[3]
            ).localCheckpoint(eager=True)
    return blooms


def _stage_violations(
    df: DataFrame,
    rules: RuleSet,
    row_key: str,
    plan: rowchecks.RowCheckPlan,
    dims: dict[str, DataFrame],
    run_id: str,
    psnr_min: float = 40.0,
    udf_parallelism: int | None = None,
    blooms: dict[tuple, DataFrame] | None = None,
) -> DataFrame:
    """Union of every check stage's violations for one input slice."""
    v = rowchecks.run_row_checks(df, rules, row_key, run_id, plan=plan)
    cols = v.columns
    if plan.fail_fast:
        # schema-level keyMissing aborts everything else
        # (reference rule.go:159-165 context cancel)
        return v
    for col, spec in plan.ref_specs:
        dim_name = spec.get("table")
        if dim_name not in dims:
            raise ValueError(f"$ref table [{dim_name}] not provided to runner")
        dim_key = spec.get("key", col)
        if spec.get("mode") == "bloom":
            # Bloom screen: the middle regime — dim too big to
            # broadcast as rows, fact side too big to shuffle.
            # Reported violations are exact; misses bounded by the
            # Bloom fpp at the configured sizing (PLANS.md §26).
            key = _bloom_key(col, spec)
            bloom = (blooms or {}).get(key)
            if bloom is None:
                bloom = refint.bloom_build(
                    dims[dim_name], dim_key, m_bits=key[2], k=key[3]
                )
            r = refint.bloom_ref_violations(
                df, col, bloom, dim_key, row_key,
                m_bits=key[2], k=key[3], run_id=run_id,
            )
        else:
            r = refint.ref_violations(
                df, col, dims[dim_name], dim_key, row_key, run_id
            )
        v = v.unionByName(r.select(*cols))
    for col, spec in plan.pixel_specs:
        p = image_checks.pixel_violations(
            df,
            row_key=row_key,
            bytes_col=col,
            psnr_min=float(spec.get("psnr_min", psnr_min)),
            run_id=run_id,
            parallelism=udf_parallelism,
        )
        v = v.unionByName(p.select(*cols))
    for col, spec in plan.vector_specs:
        from invalid_spark.checks import vector as vector_checks

        norm = spec.get("norm") or {}
        vv = vector_checks.vector_violations(
            df, col, row_key,
            dim=spec.get("dim"),
            no_nan=bool(spec.get("no_nan", True)),
            no_zero=bool(spec.get("no_zero", True)),
            norm_min=norm.get("min"),
            norm_max=norm.get("max"),
            run_id=run_id,
        )
        v = v.unionByName(vv.select(*cols))
    for col, spec in plan.align_specs:
        from invalid_spark.checks import vector as vector_checks

        av = vector_checks.alignment_violations(
            df, col, spec["with"], row_key,
            min_cos=float(spec["min_cos"]),
            run_id=run_id,
        )
        v = v.unionByName(av.select(*cols))
    for col, spec in plan.caption_specs:
        ref_name = spec.get("table")
        if ref_name not in dims:
            raise ValueError(f"$caption-eq table [{ref_name}] not provided")
        c = image_checks.caption_violations(
            df, dims[ref_name], key=spec.get("key", row_key), col=col, run_id=run_id
        )
        v = v.unionByName(c.select(*cols))
    return v


def validate(
    spark: SparkSession,
    df: DataFrame,
    rules: RuleSet,
    row_key: str,
    out_dir: str,
    dims: dict[str, DataFrame] | None = None,
    snapshot: str | None = None,
    run_id: str | None = None,
    partition_col: str | None = None,
    unit_batch: int = 16,
    prev_df: DataFrame | None = None,
    udf_parallelism: int | None = None,
    max_batches: int | None = None,
    manifest_dir: str | None = None,
    quarantine: bool = False,
) -> RunResult:
    """Run the full validation suite, resumably.

    ``max_batches`` bounds how many unit batches this call processes
    (for tests and incremental operation); a later call with the same
    ``out_dir`` resumes where it stopped.

    A resume refuses to proceed when the manifest was written against
    a different ``snapshot``: done-unit marks from another table
    state would silently skip new data while keeping stale pass
    verdicts. For CONTINUOUS validation keep ONE ``out_dir`` across
    snapshots and pass a per-snapshot ``manifest_dir`` — that is what
    lets the drift state and schema fingerprint persist between runs.
    (A fresh ``out_dir`` per snapshot also works for one-shot runs,
    but forfeits drift and schema-change continuity: each run would
    be a first run.)

    ``quarantine=True`` additionally writes the clean / quarantined
    row split (:func:`invalid_spark.report.split_valid`) under
    ``out_dir/clean`` and ``out_dir/quarantine`` — but only once
    EVERY unit (including the global uniqueness ones) is done, so a
    partial resume can never publish a "clean" table that unvalidated
    units would have dirtied.
    """
    import re

    for label, p in (("out_dir", out_dir), ("manifest_dir", manifest_dir)):
        if p and re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://", p):
            # the checkpoint manifest and the drift-state swap are
            # local-POSIX filesystem operations (os.replace etc.);
            # an object-store URI would silently disable resume and
            # drift state, then fail at the final swap
            raise ValueError(
                f"{label}={p!r} is a URI; the runner's checkpoint "
                "manifest and drift-state swap require a local POSIX "
                "path (same constraint as invalid_spark.io.Manifest). "
                "Mount or fuse the object store, or point "
                f"{label} at local scratch storage."
            )
    dims = dims or {}
    run_id = run_id or uuid.uuid4().hex[:12]
    snapshot = snapshot or ""
    plan = rowchecks.compile_row_checks(df, rules)
    manifest = Manifest(manifest_dir or os.path.join(out_dir, "manifest"))
    meta = manifest.read_meta()
    stored_snaps = {m.get("snapshot_id", "") for m in meta}
    if stored_snaps and stored_snaps != {snapshot}:
        raise ValueError(
            f"manifest at {manifest.root} was written for snapshot(s) "
            f"{sorted(stored_snaps)} but this run validates snapshot "
            f"{snapshot!r}; resuming would skip units of a different "
            "table state — use a fresh out_dir/manifest_dir per snapshot"
        )
    rules_fp = rules.fingerprint()
    stored_fps = {m["rules_fp"] for m in meta if "rules_fp" in m}
    if stored_fps and stored_fps != {rules_fp}:
        # same reasoning as the snapshot pin: done-unit marks written
        # under other rules would skip units this ruleset never
        # validated, and the audit trail would mix rule semantics
        raise ValueError(
            f"manifest at {manifest.root} was written under a "
            "different ruleset (rules fingerprint "
            f"{sorted(stored_fps)} vs {rules_fp}); resuming would mix "
            "units validated under different rules — use a fresh "
            "out_dir/manifest_dir when the rules change"
        )
    unit_meta = {
        "run_id": run_id, "snapshot_id": snapshot, "rules_fp": rules_fp,
    }
    v_dir = os.path.join(out_dir, "violations")
    result = RunResult(run_id=run_id, snapshot=snapshot, out_dir=out_dir)

    # ---- schema-level violations: once per run, their own unit ---------
    # (per-batch emission would duplicate them across resumes)
    if plan.schema_violations and not manifest.is_done("__schema__"):
        from invalid_spark import model as _model

        sdf = spark.createDataFrame(
            [
                {**sv, "partition_id": None, "run_id": run_id}
                for sv in plan.schema_violations
            ],
            schema=_model.VIOLATION_SCHEMA,
        ).select(
            "*",
            F.lit("__schema__").alias("unit"),
        )
        sdf = sdf.drop("run_id").select(
            "*", F.lit(run_id).alias("run_id"), F.lit(snapshot).alias("snapshot_id")
        )
        sdf.write.mode("append").parquet(v_dir)
        manifest.mark_done("__schema__", unit_meta)
        result.units_done.append("__schema__")
    if plan.fail_fast:
        # a missing REQUIRED column aborts the whole run (reference
        # keyMissing context-cancel, rule.go:159-165): no batch marked
        # done, so a rerun against a fixed schema starts clean
        result.fail_fast = True
        return result
    plan.schema_violations = []  # batches emit row-level checks only

    # ---- determine work units ------------------------------------------
    if partition_col is None:
        units = [["__all__"]]
        unit_of = None
    else:
        vals = [
            r[0]
            for r in df.select(_unit_expr(partition_col).alias("u"))
            .distinct()
            .orderBy("u")
            .collect()
        ]
        done = manifest.done_units()
        pending = [v for v in vals if v not in done]
        result.units_skipped = [v for v in vals if v in done]
        units = [
            pending[i : i + unit_batch] for i in range(0, len(pending), unit_batch)
        ]
        unit_of = partition_col

    if unit_of is None and manifest.is_done("__all__"):
        result.units_skipped = ["__all__"]
        units = []

    # ---- per-batch jobs -------------------------------------------------
    lineage = [
        F.lit(run_id).alias("run_id"),
        F.lit(snapshot).alias("snapshot_id"),
    ]
    n_batches = 0
    blooms = _prep_blooms(plan, dims) if units else {}
    for batch in units:
        if max_batches is not None and n_batches >= max_batches:
            break
        n_batches += 1
        if unit_of is None:
            slice_df = df
            unit_expr = F.lit("__all__")
        else:
            slice_df = df.filter(_unit_expr(unit_of).isin(batch))
            unit_expr = _unit_expr(unit_of)

        v = _stage_violations(
            slice_df, rules, row_key, plan, dims, run_id,
            udf_parallelism=udf_parallelism,
            blooms=blooms,
        )
        # attribute each violation to its unit for lineage + verdicts
        if unit_of is None:
            unit_map = None
            v_out = v.select("*", unit_expr.alias("unit"))
        else:
            # one row per key: duplicate row keys (the thing the
            # uniqueness check flags!) must not fan out the join
            unit_map = slice_df.select(
                F.col(row_key).cast("string").alias("row_key"),
                unit_expr.alias("unit"),
            ).dropDuplicates(["row_key"])
            v_out = (
                v.join(unit_map, "row_key", "left")
                .withColumn("unit", F.coalesce("unit", F.lit("__schema__")))
            )
        v_out = v_out.drop("run_id").select("*", *lineage)
        v_out.write.mode("append").parquet(v_dir)
        for u in batch:
            manifest.mark_done(u, unit_meta)
            result.units_done.append(u)

    # ---- global stages --------------------------------------------------
    # Uniqueness is a WHOLE-TABLE invariant: a key duplicated across
    # two units would be invisible to per-batch evaluation. It runs as
    # its own resumable unit over the full table (two-stage salted
    # aggregate — the shuffle carries (key, count) pairs, never rows).
    if not plan.fail_fast:
        full_unit_map = (
            None
            if unit_of is None
            else df.select(
                F.col(row_key).cast("string").alias("row_key"),
                _unit_expr(unit_of).alias("unit"),
            ).dropDuplicates(["row_key"])
        )
        for col in plan.unique_cols:
            gu = f"__unique__{col}"
            if manifest.is_done(gu):
                result.units_skipped.append(gu)
                continue
            if max_batches is not None and n_batches >= max_batches:
                break
            n_batches += 1
            u_v = unique.uniqueness_violations(df, col, row_key, run_id)
            if full_unit_map is None:
                u_out = u_v.select("*", F.lit("__all__").alias("unit"))
            else:
                u_out = u_v.join(full_unit_map, "row_key", "left").withColumn(
                    "unit", F.coalesce("unit", F.lit("__schema__"))
                )
            u_out.drop("run_id").select("*", *lineage).write.mode(
                "append"
            ).parquet(v_dir)
            manifest.mark_done(gu, unit_meta)
            result.units_done.append(gu)

        # composite natural keys ($unique: {with: [...]}) — same
        # resumable global-unit contract as single-column uniqueness
        for col, extra in plan.unique_composite:
            cols = [col] + list(extra)
            gu = "__unique__" + "~".join(cols)
            if manifest.is_done(gu):
                result.units_skipped.append(gu)
                continue
            if max_batches is not None and n_batches >= max_batches:
                break
            n_batches += 1
            u_v = unique.composite_uniqueness_violations(
                df, cols, row_key, run_id
            )
            if full_unit_map is None:
                u_out = u_v.select("*", F.lit("__all__").alias("unit"))
            else:
                u_out = u_v.join(full_unit_map, "row_key", "left").withColumn(
                    "unit", F.coalesce("unit", F.lit("__schema__"))
                )
            u_out.drop("run_id").select("*", *lineage).write.mode(
                "append"
            ).parquet(v_dir)
            manifest.mark_done(gu, unit_meta)
            result.units_done.append(gu)

        # $fd / $monotonic are whole-table invariants like $unique
        # (a dependency broken across two units, or a decrease across
        # a unit boundary, is invisible per-batch): each runs as its
        # own resumable unit; violations are real df rows, so they map
        # back to their work units exactly like uniqueness rows do.
        from invalid_spark.checks import relations as relation_checks

        def _global_stage(gu: str, build):
            nonlocal n_batches
            if manifest.is_done(gu):
                result.units_skipped.append(gu)
                return
            if max_batches is not None and n_batches >= max_batches:
                return
            n_batches += 1
            g_v = build()
            if full_unit_map is None:
                g_out = g_v.select("*", F.lit("__all__").alias("unit"))
            else:
                g_out = g_v.join(full_unit_map, "row_key", "left").withColumn(
                    "unit", F.coalesce("unit", F.lit("__schema__"))
                )
            g_out.drop("run_id").select("*", *lineage).write.mode(
                "append"
            ).parquet(v_dir)
            manifest.mark_done(gu, unit_meta)
            result.units_done.append(gu)

        for col, spec in plan.fd_specs:
            _global_stage(
                f"__fd__{col}->{spec.get('dep')}",
                lambda col=col, spec=spec: relation_checks.fd_violations(
                    df, col, spec["dep"], row_key, run_id
                ),
            )
        for col, spec in plan.monotonic_specs:
            _global_stage(
                f"__monotonic__{col}",
                lambda col=col, spec=spec: relation_checks.sequence_violations(
                    df, spec["per"], spec["order"], col, row_key,
                    strict=bool(spec.get("strict", False)), run_id=run_id,
                ),
            )
        # $dupspan: cross-document duplicated-span coverage — whole-
        # table semantics like $unique (a span shared across two work
        # units is invisible per-batch) → one resumable global unit
        from invalid_spark.pipeline import dedup as dedup_pipeline

        for col, spec in plan.dupspan_specs:
            _global_stage(
                f"__dupspan__{col}",
                lambda col=col, spec=spec: dedup_pipeline.dup_span_violations(
                    df, col, row_key, run_id,
                    n=int(spec.get("n", 3)),
                    max_coverage=float(spec.get("max_coverage", 0.5)),
                    min_df=int(spec.get("min_df", 2)),
                ),
            )
        for col, spec in plan.reconcile_specs:
            dim_name = spec["table"]
            if dim_name not in dims:
                raise ValueError(
                    f"$reconcile table [{dim_name}] not provided to runner"
                )
            # key-level failures: row_key is the reconciliation key,
            # not a df row, so units can't be attributed — the stage
            # gets its own unit name (mirrors the __schema__ pseudo
            # unit rather than polluting real units' verdicts)
            gu = f"__reconcile__{col}~{spec['value']}"
            if manifest.is_done(gu):
                result.units_skipped.append(gu)
            elif max_batches is None or n_batches < max_batches:
                n_batches += 1
                r_v = relation_checks.reconcile_violations(
                    df, dims[dim_name], col, spec["key"],
                    F.expr(spec["term"]), spec["order"], spec["value"],
                    tol=float(spec.get("tol", 0.01)), run_id=run_id,
                )
                r_v.select("*", F.lit(gu).alias("unit")).drop(
                    "run_id"
                ).select("*", *lineage).write.mode("append").parquet(v_dir)
                manifest.mark_done(
                    gu, unit_meta
                )
                result.units_done.append(gu)

    # ---- verdicts + metrics from the written violations ----------------
    # verdicts cover COMPLETED units only: a pending unit has no
    # violation rows yet and must not read as a pass.
    # The violations sink is APPEND-mode across snapshots (the
    # continuous workflow keeps one out_dir), so verdict / metric /
    # quarantine stages must see only THIS snapshot's rows: a row
    # fixed since the previous snapshot would otherwise stay
    # quarantined forever and metric counts would duplicate per run.
    # A resume of the same snapshot shares its snapshot_id, so the
    # filter keeps resumability intact. (Violation history across
    # snapshots remains queryable from the sink itself.)
    all_v = spark.read.parquet(v_dir) if os.path.exists(v_dir) else None
    if all_v is not None:
        all_v = all_v.filter(F.col("snapshot_id") == F.lit(snapshot))
    if all_v is not None:
        if unit_of is None:
            verd = report.partition_verdicts(df, all_v, run_id)
        else:
            done_now = sorted(manifest.done_units())
            # group verdicts by the SAME unit naming the manifest and
            # violation rows use (NULL → __null__), so the three
            # outputs join by unit value
            df_done = df.withColumn(unit_of, _unit_expr(unit_of)).filter(
                F.col(unit_of).isin(done_now)
            )
            verd = report.group_verdicts(df_done, all_v, unit_of, row_key, run_id)
        verd.write.mode("overwrite").parquet(os.path.join(out_dir, "verdicts"))
        met = report.rule_metrics(all_v, run_id)
        met.write.mode("overwrite").parquet(os.path.join(out_dir, "metrics"))

    # ---- run completeness (drives quarantine + the appended-commit) ----
    expected = (
        ({"__all__"} if unit_of is None else set(vals))
        | {f"__unique__{c}" for c in plan.unique_cols}
        | {"__unique__" + "~".join([c] + list(e))
           for c, e in plan.unique_composite}
        | {f"__fd__{c}->{s.get('dep')}" for c, s in plan.fd_specs}
        | {f"__monotonic__{c}" for c, _ in plan.monotonic_specs}
        | {f"__dupspan__{c}" for c, _ in plan.dupspan_specs}
        | {f"__reconcile__{c}~{s['value']}" for c, s in plan.reconcile_specs}
    )
    result.complete = expected <= manifest.done_units()

    # ---- quarantine split (opt-in), only under FULL coverage -----------
    if quarantine and all_v is not None and not plan.fail_fast:
        if result.complete:
            from invalid_spark.model import ErrorType as _ET

            # $reconcile violations are KEY-level (row_key is the
            # reconciliation key, not a table row key): a numeric
            # collision with a real row key would silently quarantine
            # an innocent row, so they never feed the split
            row_level = all_v.filter(
                F.col("error_type") != _ET.RECONCILE_MISMATCH
            )
            clean, quarantined = report.split_valid(df, row_level, row_key)
            clean.write.mode("overwrite").parquet(
                os.path.join(out_dir, "clean")
            )
            quarantined.write.mode("overwrite").parquet(
                os.path.join(out_dir, "quarantine")
            )

    # ---- schema-change detection (zero scans: driver metadata) ---------
    # The previous snapshot's schema fingerprint lives under OUT_DIR
    # (like the drift state): the continuous workflow is one out_dir
    # across snapshots with a per-snapshot manifest_dir. A fresh
    # out_dir per snapshot forfeits schema (and drift) continuity —
    # there is nothing to compare against.
    import json as _json

    from invalid_spark.checks import schema as schema_checks

    schema_path = os.path.join(out_dir, "schema_state.json")
    fp = schema_checks.schema_fingerprint(df)
    stored_schema = None
    if os.path.exists(schema_path):
        with open(schema_path, encoding="utf-8") as f:
            stored_schema = _json.load(f)
    schema_stale = (
        stored_schema is None or stored_schema.get("snapshot") != snapshot
    )
    if stored_schema is not None and schema_stale:
        changes = schema_checks.schema_changes(fp, stored_schema["schema"])
        spark.createDataFrame(
            [(c, ch, b, a, run_id, snapshot) for c, ch, b, a in changes],
            "col_name string, change string, before string, after string, "
            "run_id string, snapshot_id string",
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, "schema_changes")
        )
    if schema_stale:
        # tmp + atomic replace, local-POSIX like the manifest
        tmp = schema_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            _json.dump({"snapshot": snapshot, "schema": fp}, f)
        os.replace(tmp, schema_path)

    # ---- table-level stat assertions ($assert), one aggregation --------
    if plan.assert_specs and not plan.fail_fast:
        a_specs = [
            {"col": col, "stat": spec.get("stat", "null_rate"),
             **{k: spec[k] for k in ("min", "max") if k in spec}}
            for col, spec in plan.assert_specs
        ]
        stats.stat_assertions(df, a_specs, run_id=run_id).withColumn(
            "snapshot_id", F.lit(snapshot)
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "assertions"))

    # ---- declared-distribution gates ($dist) ----------------------------
    # One corpus aggregate per $dist rule (rare rules; a multi-column
    # single-pass variant would follow multi_grid's tagged pattern if
    # wide $dist rule sets ever show up). Verdict rows are tiny and
    # snapshot-stamped; the sink is overwrite-mode like assertions.
    if plan.dist_specs and not plan.fail_fast:
        d_out = None
        for col, spec in plan.dist_specs:
            one = drift_checks.chi2_vs_expected(
                df, col, spec["expected"], float(spec.get("alpha", 0.05))
            )
            d_out = one if d_out is None else d_out.unionByName(one)
        d_out.withColumn("run_id", F.lit(run_id)).withColumn(
            "snapshot_id", F.lit(snapshot)
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, "distribution")
        )

    # ---- metric history + $anomaly (continuous leg 3) -------------------
    # Each run appends O(rules) metric rows to out_dir/metrics_history;
    # $anomaly rules judge the CURRENT value against the prior runs'
    # history (absolute bounds + relative change vs the last-k mean).
    # Like drift state and the schema fingerprint this requires ONE
    # out_dir across snapshots; evaluation is driver-side over the
    # collected tiny history, the only cluster work one aggregation.
    if plan.anomaly_specs and not plan.fail_fast:
        from invalid_spark.checks import anomaly as anomaly_checks

        hist_dir = os.path.join(out_dir, "metrics_history")
        hist_rows = (
            spark.read.parquet(hist_dir).collect()
            if os.path.exists(hist_dir)
            else []
        )
        max_seq = max((r["seq"] for r in hist_rows), default=0)
        seen_snap = any(r["snapshot_id"] == snapshot for r in hist_rows)
        # an idempotent re-run of the SAME snapshot must not compare
        # the run against its own appended metrics
        prior = [r for r in hist_rows if r["snapshot_id"] != snapshot]
        cur_vals = anomaly_checks.current_metric_values(
            df, all_v, plan.anomaly_specs
        )
        results = anomaly_checks.evaluate(
            plan.anomaly_specs, cur_vals, prior
        )
        spark.createDataFrame(
            [
                (r.col, r.metric, r.value, r.baseline, r.rel_change,
                 r.z, r.n_history, r.passed, run_id, snapshot)
                for r in results
            ],
            anomaly_checks.ANOMALY_SCHEMA,
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "anomalies"))
        if not seen_snap:
            new_rows = [
                (col, m, v, max_seq + 1, run_id, snapshot)
                for (col, m), v in sorted(cur_vals.items())
            ]
            spark.createDataFrame(
                new_rows, anomaly_checks.HISTORY_SCHEMA
            ).write.mode("append").parquet(hist_dir)

    # ---- drift stage (snapshot-vs-snapshot, outside unit loop) ---------
    # Comparison source, in priority order: an explicit prev_df
    # (rescan path), else the PREVIOUS run's persisted O(bins) drift
    # state under out_dir/drift_state — continuous validation never
    # re-reads the prior snapshot. Either way this run's state is
    # written for the next run.
    #
    # Scan budget is CONSTANT in the number of $drift rules: one grid
    # aggregation (all numeric min/max or clip quantiles together) +
    # one tagged histogram pass covering every column
    # (drift.multi_state), instead of 2 scans per column. A per-spec
    # `clip: [qlo, qhi]` bounds that column's grid by quantiles on
    # both the comparison and the persisted state, so the stored
    # histogram is outlier-proof too.
    state_dir = os.path.join(out_dir, "drift_state")
    old_dir = state_dir + ".old"
    if os.path.exists(old_dir) and not os.path.exists(state_dir):
        # a crash between swap steps left only the set-aside copy:
        # recover it so the stored-state comparison still happens
        os.replace(old_dir, state_dir)
    if plan.drift_specs:
        # a $drift rule on an ARRAY column expands into per-plane
        # scalar specs over md5-hyperplane projections (columns named
        # "<col>#p<i>" — stable across runs because the planes are
        # md5-derived, never RNG); everything downstream — grids,
        # tagged histogram state, verdict rows, stored-state
        # comparison — then treats an embedding like `planes`
        # ordinary numeric columns
        d_specs, d_df, d_prev = _expand_vector_drift(
            df, plan.drift_specs, prev_df
        )
        stored = (
            spark.read.parquet(state_dir)
            if prev_df is None and os.path.exists(state_dir)
            else None
        )
        # The stored state is tagged with the snapshot it was built
        # from: a resume/re-run of the SAME snapshot must not compare
        # the table against its own state (statistic 0 would overwrite
        # the real drift verdict) nor re-write identical state.
        stored_snap = None
        if stored is not None:
            head = stored.select("snapshot_id").limit(1).collect()
            stored_snap = head[0]["snapshot_id"] if head else None
            if stored_snap == snapshot:
                stored = None  # same table state: nothing new to test
        cur_grids = None
        if prev_df is not None:
            # one grid aggregation serves both the comparison and the
            # state persistence below (no second scan for the grid)
            cur_grids = drift_checks.multi_grid(d_df, d_specs)
            results = drift_checks.multi_drift(
                d_df, d_prev, d_specs, cur_grids=cur_grids
            )
        elif stored is not None:
            # columns with no stored state rows (a $drift rule added
            # since the stored run) are omitted — nothing to compare
            # yet; their fresh state is written below
            results = drift_checks.multi_drift_vs_state(
                d_df, d_specs, stored
            )
        else:
            results = {}  # first run: nothing to compare against yet
        rows = [
            (r.column, r.test, float(r.statistic), float(r.p_value),
             bool(r.drifted), run_id, snapshot)
            for _, r in sorted(results.items())
        ]
        if rows:
            spark.createDataFrame(
                rows,
                "column string, test string, statistic double, p_value double, "
                "drifted boolean, run_id string, snapshot_id string",
            ).write.mode("overwrite").parquet(os.path.join(out_dir, "drift"))
        # persist this run's state unless it is already current: one
        # grid pass + one tagged histogram pass for ALL columns
        if not (prev_df is None and stored is None and stored_snap == snapshot):
            grids = (
                cur_grids if cur_grids is not None
                else drift_checks.multi_grid(d_df, d_specs)
            )
            states = drift_checks.state_frame(
                d_df, d_specs, grids
            ).withColumn("snapshot_id", F.lit(snapshot))
            tmp_dir = state_dir + ".tmp"
            states.write.mode("overwrite").parquet(tmp_dir)
            import shutil

            # three-step swap so a crash at ANY point leaves a
            # recoverable state directory (either state_dir itself or
            # the .old set-aside, recovered above): set the previous
            # state aside, promote the new one, then drop the old
            if os.path.exists(old_dir):
                shutil.rmtree(old_dir)
            if os.path.exists(state_dir):
                os.replace(state_dir, old_dir)
            os.replace(tmp_dir, state_dir)
            if os.path.exists(old_dir):
                shutil.rmtree(old_dir)

    return result


def _expand_vector_drift(
    df: DataFrame,
    specs: list[tuple[str, dict]],
    prev_df: DataFrame | None,
) -> tuple[list[tuple[str, dict]], DataFrame, DataFrame | None]:
    """Rewrite ``$drift`` specs on ARRAY columns into per-plane scalar
    specs over md5-hyperplane projections (Cramér–Wold sketch — see
    ``drift.embedding_drift``), returning (expanded specs, augmented
    current frame, augmented prev frame).

    Spec keys on a vector column: ``planes`` (default 4) and ``dim``
    (pass it to keep the stage action-free; without it one ``first()``
    probes the width). The projection columns are named
    ``<col>#p<i>`` — deterministic across runs, so stored-state
    comparison just works; changing ``planes`` between runs makes the
    extra planes "new columns" (omitted from comparison once, fresh
    state written). Scalar specs and frames pass through untouched."""
    from pyspark.sql.types import ArrayType

    out: list[tuple[str, dict]] = []
    proj: list[tuple[str, list[float]]] = []  # (out_name, plane)
    for col, spec in specs:
        try:
            is_vec = isinstance(df.schema[col].dataType, ArrayType)
        except KeyError:
            is_vec = False
        if not is_vec:
            out.append((col, spec))
            continue
        planes = int(spec.get("planes", 4))
        dim = spec.get("dim")
        if dim is None:
            row = df.select(col).filter(F.col(col).isNotNull()).first()
            dim = len(row[0]) if row else 0
        scalar = {
            k: v for k, v in spec.items() if k not in ("planes", "dim")
        }
        scalar.setdefault("test", "ks")
        for p, plane in enumerate(
            drift_checks.projection_planes(int(dim), planes)
        ):
            name = f"{col}#p{p}"
            proj.append((name, col, plane))
            out.append((name, dict(scalar)))
    if not proj:
        return specs, df, prev_df

    def aug(d: DataFrame | None) -> DataFrame | None:
        if d is None:
            return None
        return d.select(
            "*",
            *[
                drift_checks.projection_expr(c, pl).alias(n)
                for n, c, pl in proj
            ],
        )

    return out, aug(df), aug(prev_df)


def incremental_rows(
    cur: DataFrame, prev: DataFrame, row_key: str
) -> DataFrame:
    """Rows present in ``cur`` but not in ``prev`` — the delta a
    snapshot-incremental validation run processes. In production this
    is Iceberg's incremental read between snapshot ids (changelog
    scan); the portable fallback is a LEFT ANTI join on the row key,
    which Catalyst executes as a broadcast or shuffle join depending
    on the old-key-set size. Validating only the delta is what makes
    continuous validation affordable on a 10^12-row table: cost
    scales with the append, not the table."""
    prev_keys = prev.select(F.col(row_key).alias("__pk")).distinct()
    return cur.join(prev_keys, F.col(row_key) == F.col("__pk"), "left_anti")


def snapshot_diff(
    cur: DataFrame,
    prev: DataFrame,
    row_key: str,
    cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots: (row_key, change) with
    change ∈ added | removed | changed — the "what actually changed"
    question a validation report raises next. Unchanged rows are
    omitted, so the result is delta-sized.

    One full-outer join on the row key (both sides shuffle on the
    key — unavoidable for a diff; AQE sizes the join) comparing a
    single md5 row fingerprint per side, so the join payload is
    (key, 32-byte hash), never the row. ``cols`` defaults to every
    shared non-key column IN CUR'S COLUMN ORDER. Row keys must be
    unique per side (it's a diff, not a multiset reconcile — that's
    ``$reconcile``); float columns compare by their string rendering,
    which differs across engines — list explicit ``cols`` without
    floats when an external oracle must replay the fingerprint."""
    if cols is None:
        prev_cols = set(prev.columns)
        cols = [
            c for c in cur.columns if c != row_key and c in prev_cols
        ]
    if not cols:
        raise ValueError("snapshot_diff: no shared non-key columns")

    def fingerprint(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(row_key).cast("string").alias("rk"),
            F.md5(
                F.concat_ws(
                    "\x1f",
                    *[
                        F.coalesce(F.col(c).cast("string"), F.lit("∅"))
                        for c in cols
                    ],
                )
            ).alias("h"),
        )

    a = fingerprint(cur).alias("a")
    b = fingerprint(prev).alias("b")
    j = a.join(b, F.col("a.rk") == F.col("b.rk"), "full_outer")
    change = (
        F.when(F.col("b.rk").isNull(), F.lit("added"))
        .when(F.col("a.rk").isNull(), F.lit("removed"))
        .when(F.col("a.h") != F.col("b.h"), F.lit("changed"))
    )
    return j.select(
        F.coalesce(F.col("a.rk"), F.col("b.rk")).alias("row_key"),
        change.alias("change"),
    ).filter(F.col("change").isNotNull())


def validate_incremental(
    spark: SparkSession,
    cur: DataFrame,
    prev: DataFrame,
    rules: RuleSet,
    row_key: str,
    out_dir: str,
    **kwargs,
) -> RunResult:
    """Validate only the rows added since ``prev``; outputs append to
    the same sinks (each run distinguished by run_id + snapshot).

    Requires a ``snapshot`` id: the checkpoint manifest is namespaced
    per snapshot (``manifest-{snapshot}``), so each delta resumes
    independently. A shared manifest would mark ``__all__`` done on
    the first delta and silently skip every later one — stale pass
    verdicts over unvalidated data."""
    snapshot = kwargs.get("snapshot")
    if not snapshot:
        raise ValueError(
            "validate_incremental requires snapshot=<id of the current "
            "table state> (e.g. invalid_spark.io.snapshot_id(path)); the "
            "per-snapshot manifest namespace is what lets successive "
            "deltas against the same out_dir each be validated"
        )
    kwargs.setdefault(
        "manifest_dir", os.path.join(out_dir, f"manifest-{snapshot}")
    )
    delta = incremental_rows(cur, prev, row_key)
    return validate(spark, delta, rules, row_key, out_dir, **kwargs)


def validate_appended(
    spark: SparkSession,
    table_path: str,
    log,
    rules: RuleSet,
    row_key: str,
    out_dir: str,
    prev_snapshot_df: DataFrame | None = None,
    **kwargs,
) -> RunResult:
    """FILE-level incremental validation against a
    :class:`~invalid_spark.io.TableLog`: read ONLY the files the
    table added since the latest logged snapshot, validate those, and
    commit the new state to the log AFTER validation completes —
    append detection costs zero data scans (the Iceberg-manifest
    contract), unlike :func:`validate_incremental`'s row-level
    anti-join, which must scan both snapshots. Use this when the
    table grows by appending files (the normal ingest shape).

    Kill-safety ordering: the snapshot id is content-addressed from
    the previewed file list (:meth:`TableLog.pending_id`), so the
    checkpoint manifest can be namespaced ``manifest-{snapshot}``
    up front while the commit waits until :func:`validate` returns.
    A run killed mid-delta therefore leaves the log untouched; the
    retry previews the SAME pending state, resumes the delta through
    its manifest, and only then commits. (Committing first — the
    pre-round-5 behavior — made the retry's preview diff against the
    already-committed state and no-op, silently never validating the
    appended files.) A fail-fasted run (missing required column) also
    leaves the log uncommitted, so the delta stays pending until the
    schema or rules are fixed.

    Removed or in-place-rewritten files mean file identity no longer
    implies row identity, so the file-level contract is unsound. With
    ``prev_snapshot_df`` (the previous snapshot's rows — in
    production an Iceberg time-travel read of the parent snapshot;
    in the parquet stand-in a caller-retained copy, e.g. the clean
    sink) the run degrades to a ROW-level diff fallback: it validates
    exactly the added+changed row set from :func:`snapshot_diff`,
    stamps ``RunResult.mode = "row_diff_fallback"``, records the mode
    next to the manifest, and re-baselines the log on success.
    Without it, the refusal raises — and keeps raising on retry,
    because nothing was committed.

    Resumable per snapshot: the manifest namespace is
    ``manifest-{snapshot}`` (the :func:`validate_incremental`
    convention), so re-running after a kill resumes the delta, and
    re-running with no new files skips the already-done delta via its
    manifest (no recompute)."""
    pv = log.preview(table_path)
    snap = log.pending_id(pv["entries"])
    run_id = kwargs.pop("run_id", None) or uuid.uuid4().hex[:12]

    if pv["removed"] or pv["changed"]:
        if prev_snapshot_df is None:
            # refuse WITHOUT committing: a recorded unsound snapshot
            # would become the next run's baseline and the refusal
            # would fire exactly once — an automated retry would then
            # silently skip the rewritten data forever
            raise ValueError(
                f"table at {table_path} removed files {pv['removed'][:3]} "
                f"/ rewrote files {pv['changed'][:3]} since snapshot "
                f"{pv['parent']}: file-level append validation is unsound "
                "after a rewrite or compaction — pass prev_snapshot_df= "
                "(the previous snapshot's rows) for the row-level diff "
                "fallback, or run a full validate() / "
                "validate_incremental(), then re-baseline with a fresh "
                "TableLog"
            )
        # row-level fallback: validate exactly the rows the rewrite
        # added or changed (snapshot_diff's delta-sized full-outer
        # hash join), then re-baseline the log
        cur = spark.read.parquet(table_path)
        delta_keys = (
            snapshot_diff(cur, prev_snapshot_df, row_key)
            .filter(F.col("change").isin("added", "changed"))
            .select("row_key")
        )
        delta = cur.join(
            delta_keys,
            F.col(row_key).cast("string") == delta_keys["row_key"],
            "left_semi",
        )
        kwargs.setdefault(
            "manifest_dir", os.path.join(out_dir, f"manifest-{snap}")
        )
        kwargs["snapshot"] = snap
        res = validate(
            spark, delta, rules, row_key, out_dir, run_id=run_id, **kwargs
        )
        res.mode = "row_diff_fallback"
        if res.complete and not res.fail_fast:
            _record_mode(kwargs["manifest_dir"], res.mode, run_id, snap)
            log.commit(table_path, entries=pv["entries"])
        return res

    added = pv["added"]
    if not added:
        result = RunResult(run_id=run_id, snapshot=snap, out_dir=out_dir)
        result.units_skipped = ["__no_new_files__"]
        return result
    # basePath keeps directory-partitioned layouts (date=.../part-*)
    # yielding their partition columns even though only leaf files
    # are read
    df = spark.read.option("basePath", table_path).parquet(
        *[os.path.join(table_path, p) for p in added]
    )
    kwargs.setdefault("manifest_dir", os.path.join(out_dir, f"manifest-{snap}"))
    kwargs["snapshot"] = snap
    res = validate(
        spark, df, rules, row_key, out_dir, run_id=run_id, **kwargs
    )
    # commit ONLY a fully validated snapshot: a fail-fast or a
    # max_batches-bounded partial run leaves the log untouched, so the
    # retry previews the same pending state and resumes via its
    # manifest instead of no-opping on an already-committed baseline
    if res.complete and not res.fail_fast:
        log.commit(table_path, entries=pv["entries"])
    return res


def _record_mode(manifest_dir: str, mode: str, run_id: str, snap: str) -> None:
    """Persist a degraded-mode marker next to the checkpoint manifest
    so the audit trail shows WHICH contract validated this snapshot
    (file-level runs write nothing — normal mode is the default)."""
    os.makedirs(manifest_dir, exist_ok=True)
    path = os.path.join(manifest_dir, "mode.json")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"mode": mode, "run_id": run_id, "snapshot_id": snap}, f)
    os.replace(tmp, path)


def validate_suite(
    spark: SparkSession,
    suite: dict,
    out_dir: str,
    **common,
) -> dict[str, RunResult]:
    """Validate SEVERAL tables under one audit root — the
    multi-table checkpoint (deequ ``VerificationSuite`` / Great
    Expectations checkpoint analog). ``suite`` is the parsed config:

    .. code-block:: yaml

        tables:
          documents:
            path: /data/documents        # parquet path
            rules: rules_documents.yaml  # or a loaded RuleSet
            row_key: doc_id
            partition_col: source        # optional
            dims: {licenses: /data/licenses}   # optional
            quarantine: true             # optional

    Each table validates into ``out_dir/<name>`` with its OWN
    manifest, so a killed suite resumes exactly where it stopped:
    completed tables skip wholesale (their units are done), the
    in-flight table resumes at its unit batch. Tables run in config
    order; a table whose rules fail-fast (missing required column)
    still yields a result — :func:`suite_summary` reports it
    ``passed: false, fail_fast: true`` — while execution errors
    (unreadable path, bad rules file) raise. ``common`` kwargs (e.g.
    ``unit_batch``) apply to every table; per-table keys win."""
    from invalid_spark.dsl import load_rules_file

    results: dict[str, RunResult] = {}
    for name, cfg in suite["tables"].items():
        df = spark.read.parquet(cfg["path"])
        rules = cfg["rules"]
        if isinstance(rules, str):
            rules = load_rules_file(rules)
        dims = {
            dn: spark.read.parquet(dp)
            for dn, dp in (cfg.get("dims") or {}).items()
        }
        kwargs = dict(common)
        for k in ("partition_col", "unit_batch", "quarantine", "prev_table"):
            if k in cfg:
                kwargs[k] = cfg[k]
        prev_path = kwargs.pop("prev_table", None)
        if prev_path:
            kwargs["prev_df"] = spark.read.parquet(prev_path)
        results[name] = validate(
            spark,
            df,
            rules,
            cfg.get("row_key", "id"),
            os.path.join(out_dir, name),
            dims=dims,
            snapshot=snapshot_id(cfg["path"]),
            **kwargs,
        )
    return results


def suite_summary(
    spark: SparkSession, results: dict[str, RunResult]
) -> dict:
    """One JSON-able roll-up per suite run: per-table violation
    counts, verdict pass/fail, and units done/skipped. A table whose
    run FAIL-FASTED (missing required column: ``validate`` returns
    after writing only the schema violation, before any verdicts
    sink exists) is reported ``passed: false`` with
    ``fail_fast: true`` rather than crashing the roll-up on the
    absent verdicts parquet."""
    out: dict = {"tables": {}, "passed": True}
    for name, res in results.items():
        # a fail-fasted run returns before most sinks exist; a
        # completed run over an empty table can also leave zero
        # verdict rows — so fail-fast is the run's EXPLICIT flag, and
        # every sink read is existence-guarded rather than inferred
        if os.path.exists(os.path.join(res.out_dir, "violations")):
            v = res.violations(spark)
            n = v.filter(F.col("snapshot_id") == res.snapshot).count()
        else:
            n = 0
        if os.path.exists(os.path.join(res.out_dir, "verdicts")):
            verd = [
                r.asDict()
                for r in res.verdicts(spark)
                .filter(F.col("run_id") == res.run_id)
                .collect()
            ]
        else:
            verd = []
        fail_fast = res.fail_fast
        passed = all(r["passed"] for r in verd) and n == 0 and not fail_fast
        out["tables"][name] = {
            "run_id": res.run_id,
            "snapshot_id": res.snapshot,
            "violations": n,
            "units_done": res.units_done,
            "units_skipped": res.units_skipped,
            "passed": passed,
        }
        if fail_fast:
            out["tables"][name]["fail_fast"] = True
        out["passed"] = out["passed"] and passed
    return out


def profile(
    df: DataFrame, rules: RuleSet, run_id: str = ""
) -> DataFrame | None:
    """Column statistics for every ``$stats`` directive (one pass)."""
    plan = rowchecks.compile_row_checks(df, rules)
    if not plan.stats_specs:
        return None
    return stats.column_profile(df, plan.stats_specs, run_id=run_id)
