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
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    master = f"local[{args.cpus}]" if args.cpus else None
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
