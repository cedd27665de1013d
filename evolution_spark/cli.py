"""Command-line interface mirroring the reference CLI
(examples/full/src/cli.rs:46-243): ``convert`` and ``mock`` subcommands.

Flag mapping (reference -> here):
  -N/--n-threads              -> --cpus (local[] cores; a cluster deploy would
                                 use spark-submit resource flags instead)
  -R/--read-buffer-size       -> --max-partition-bytes (split size of the scan)
  -W/--write-buffer-size      -> n/a (Spark sizes write batches itself)
  -C/--thread-channel-capacity-> n/a (no channel topology; accepted + ignored)

Usage:
  python -m evolution_spark convert -i data.flf -s schema.json -o out -t parquet
  python -m evolution_spark mock -s schema.json -o out.flf -n 1000000
  python -m evolution_spark maintain -T table_dir -f delta \
      --optimize 4 --checkpoint --vacuum 2
"""

from __future__ import annotations

import argparse
import sys

from evolution_spark.converter import Converter, Target
from evolution_spark.mocker import Mocker
from evolution_spark.schema import FixedSchema
from evolution_spark.session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="evolution-spark")
    sub = p.add_subparsers(dest="command", required=True)

    conv = sub.add_parser("convert", help="convert a fixed-length file")
    conv.add_argument("-i", "--in-file", required=True)
    conv.add_argument("-s", "--schema", required=True)
    conv.add_argument("-o", "--out-file", required=True)
    conv.add_argument("-t", "--target", default="parquet",
                      choices=[t.value for t in Target])
    conv.add_argument("--mode", default="abort", choices=["abort", "permissive"])
    conv.add_argument("--save-mode", default="error")
    conv.add_argument("--single-file", action="store_true",
                      help="one output file (reference parity via coalesce(1))")
    conv.add_argument("--float-format", default="native",
                      choices=["native", "plain"],
                      help="FLF sink float rendering: native Spark (scientific"
                           " >=1e7) or plain shortest decimal (Rust Display"
                           " parity; required for byte-identical roundtrips)")
    conv.add_argument("-R", "--max-partition-bytes", type=int, default=None)
    conv.add_argument("-p", "--partition-by", default=None,
                      help="comma-separated columns for hive-style output partitioning")
    conv.add_argument("-C", "--thread-channel-capacity", type=int, default=None,
                      help="accepted for reference CLI parity; no-op on Spark")
    conv.add_argument("-N", "--cpus", type=int, default=None)

    mock = sub.add_parser("mock", help="generate mock fixed-length data")
    mock.add_argument("-s", "--schema", required=True)
    mock.add_argument("-o", "--out-file", required=True)
    mock.add_argument("-n", "--n-rows", type=int, required=True)
    mock.add_argument("--seed", type=int, default=42)
    mock.add_argument("--single-file", action="store_true")
    mock.add_argument("--save-mode", default="error")
    mock.add_argument("-N", "--cpus", type=int, default=None)

    maint = sub.add_parser(
        "maintain",
        help="table maintenance on native delta/iceberg tables "
             "(optimize / vacuum / checkpoint / expire-snapshots)",
    )
    maint.add_argument("-T", "--table", required=True, help="table directory")
    maint.add_argument("-f", "--format", default="delta",
                       choices=["delta", "iceberg"])
    maint.add_argument("--optimize", type=int, metavar="N", default=None,
                       help="compact live files to N files (delta)")
    maint.add_argument("--zorder-by", default=None, metavar="COL[,COL...]",
                       help="delta: z-order-cluster the optimize rewrite on "
                            "these columns (requires --optimize)")
    maint.add_argument("--vacuum", type=int, metavar="KEEP", default=None,
                       help="delta: delete files unreferenced by the last "
                            "KEEP versions")
    maint.add_argument("--checkpoint", action="store_true",
                       help="delta: write a parquet log checkpoint")
    maint.add_argument("--expire-snapshots", type=int, metavar="KEEP",
                       default=None,
                       help="iceberg: expire all but the last KEEP snapshots")
    maint.add_argument("-N", "--cpus", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    master = f"local[{args.cpus}]" if args.cpus else None

    if args.command == "maintain":
        import json as _json

        results: dict = {}
        if args.format == "delta":
            from evolution_spark.io.delta_log import (
                checkpoint_delta,
                optimize_delta,
                vacuum_delta,
            )

            if args.expire_snapshots is not None:
                raise SystemExit("--expire-snapshots applies to iceberg tables")
            if args.zorder_by and args.optimize is None:
                raise SystemExit("--zorder-by requires --optimize")
            if args.optimize is not None:
                from pyspark.sql import SparkSession

                # reuse an active session (library/test callers) — only
                # stop one this command itself created
                existing = SparkSession.getActiveSession()
                spark = existing or get_spark(
                    app_name="evolution-spark-maintain", master=master
                )
                try:
                    results["optimize"] = optimize_delta(
                        spark,
                        args.table,
                        target_files=args.optimize,
                        zorder_by=(
                            args.zorder_by.split(",") if args.zorder_by else None
                        ),
                    )
                finally:
                    if existing is None:
                        spark.stop()
            if args.checkpoint:
                results["checkpoint"] = checkpoint_delta(args.table)
            if args.vacuum is not None:
                v = vacuum_delta(args.table, keep_versions=args.vacuum)
                results["vacuum"] = {
                    "deleted_files": len(v["deleted"]),
                    "kept_versions": v["kept_versions"],
                }
        else:
            from evolution_spark.io.iceberg_meta import expire_iceberg_snapshots

            if (
                args.optimize is not None
                or args.vacuum is not None
                or args.checkpoint
                or args.zorder_by
            ):
                raise SystemExit(
                    "--optimize/--zorder-by/--vacuum/--checkpoint apply to "
                    "delta tables"
                )
            if args.expire_snapshots is not None:
                results["expire"] = expire_iceberg_snapshots(
                    args.table, keep_last=args.expire_snapshots
                )
        if not results:
            raise SystemExit("maintain: no action requested")
        print(_json.dumps(results, default=str))
        return 0

    spark = get_spark(app_name=f"evolution-spark-{args.command}", master=master)
    try:
        schema = FixedSchema.from_path(args.schema)
        if args.command == "convert":
            Converter(
                input_path=args.in_file,
                schema=schema,
                output_path=args.out_file,
                target=Target(args.target),
                mode=args.mode,
                save_mode=args.save_mode,
                single_file=args.single_file,
                max_partition_bytes=args.max_partition_bytes,
                partition_by=args.partition_by.split(",") if args.partition_by else None,
                float_format=args.float_format,
            ).run(spark)
        else:
            Mocker(
                schema=schema,
                n_rows=args.n_rows,
                output_path=args.out_file,
                seed=args.seed,
                single_file=args.single_file,
                save_mode=args.save_mode,
            ).run(spark)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
