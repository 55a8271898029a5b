"""spark-submit entry point (north rule: ``spark-submit --py-files``).

Usage (cluster):

    zip -r invalid_spark.zip invalid_spark
    spark-submit --py-files invalid_spark.zip invalid_spark/cli.py \\
        validate --table s3://…/images --rules rules.yaml \\
        --out /mnt/shared/audit/run1 --partition-col date_bucket \\
        --dim licenses=s3://…/dims/licenses

``--table``/``--dim`` may be object-store URIs (they only feed Spark
readers), but ``--out`` must be a LOCAL POSIX path visible to the
driver: the checkpoint manifest and the drift-state swap use atomic
local renames (``invalid_spark.io.Manifest``'s constraint — the
runner rejects URI out paths up front). On a cluster, point it at
shared/fuse-mounted storage.

Local (this sandbox):

    python -m invalid_spark.cli validate --table /root/testdata/... \\
        --rules rules.yaml --out /tmp/audit

Subcommands: ``validate`` (full resumable suite), ``profile``
(column stats for every ``$stats`` directive). The SparkSession is
taken from ``getOrCreate`` so spark-submit's ``--master``/conf apply;
local runs fall back to the tuned local profile in
:mod:`invalid_spark.session`.
"""

from __future__ import annotations

import argparse
import json
import sys


def _get_session(args):
    from pyspark.sql import SparkSession

    if args.local_cores:
        from invalid_spark.session import get_spark

        return get_spark("invalid_spark_cli", cores=args.local_cores)
    return SparkSession.builder.appName("invalid_spark_cli").getOrCreate()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="invalid_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pv = sub.add_parser("validate", help="run the full validation suite")
    pv.add_argument("--table", required=True, help="input parquet path")
    pv.add_argument("--rules", required=True, help="rule YAML file")
    pv.add_argument("--out", required=True, help="output/checkpoint dir")
    pv.add_argument("--row-key", default="image_id")
    pv.add_argument("--partition-col", default=None,
                    help="data column defining resumable work units")
    pv.add_argument("--unit-batch", type=int, default=16)
    pv.add_argument("--dim", action="append", default=[],
                    metavar="NAME=PATH", help="dimension table (repeatable)")
    pv.add_argument("--prev-table", default=None,
                    help="prior snapshot for $drift checks")
    pv.add_argument("--run-id", default=None)
    pv.add_argument("--udf-parallelism", type=int, default=None)
    pv.add_argument("--quarantine", action="store_true",
                    help="also write clean/ and quarantine/ row splits "
                    "(only once every unit is validated)")
    pv.add_argument("--local-cores", type=int, default=None)

    pp = sub.add_parser("profile", help="column statistics ($stats rules)")
    pp.add_argument("--table", required=True)
    pp.add_argument("--rules", required=True)
    pp.add_argument("--out", default=None, help="optional parquet output")
    pp.add_argument("--local-cores", type=int, default=None)

    ps = sub.add_parser(
        "suggest",
        help="profile a table and print a suggested rule YAML the "
        "table satisfies (deequ-style suggestion on-ramp)",
    )
    ps.add_argument("--table", required=True)
    ps.add_argument("--row-key", default=None)
    ps.add_argument("--ndv-enum-max", type=int, default=16)
    ps.add_argument("--local-cores", type=int, default=None)

    args = ap.parse_args(argv)
    spark = _get_session(args)

    from invalid_spark import runner
    from invalid_spark.dsl import load_rules_file
    from invalid_spark.io import snapshot_id

    df = spark.read.parquet(args.table)

    if args.cmd == "suggest":
        from invalid_spark import suggest

        sys.stdout.write(
            suggest.suggest_rules(
                df, row_key=args.row_key, ndv_enum_max=args.ndv_enum_max
            )
        )
        return 0

    rules = load_rules_file(args.rules)

    if args.cmd == "profile":
        prof = runner.profile(df, rules)
        if prof is None:
            print(json.dumps({"error": "no $stats directives in rules"}))
            return 1
        if args.out:
            prof.write.mode("overwrite").parquet(args.out)
        for r in prof.collect():
            print(json.dumps(r.asDict()))
        return 0

    dims = {}
    for d in args.dim:
        name, path = d.split("=", 1)
        dims[name] = spark.read.parquet(path)
    prev_df = spark.read.parquet(args.prev_table) if args.prev_table else None

    res = runner.validate(
        spark, df, rules, args.row_key, args.out,
        dims=dims,
        snapshot=snapshot_id(args.table),
        run_id=args.run_id,
        partition_col=args.partition_col,
        unit_batch=args.unit_batch,
        prev_df=prev_df,
        udf_parallelism=args.udf_parallelism,
        quarantine=args.quarantine,
    )
    n_viol = res.violations(spark).count()
    verd = [r.asDict() for r in res.verdicts(spark).collect()]
    print(json.dumps({
        "run_id": res.run_id,
        "snapshot_id": res.snapshot,
        "units_done": res.units_done,
        "units_skipped": res.units_skipped,
        "violations": n_viol,
        "verdicts": verd,
        "passed": all(v["passed"] for v in verd) and n_viol == 0,
    }, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
