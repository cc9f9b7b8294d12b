"""CLI runner — the `python call-debias.py` equivalent.

    python -m debias_spark.cli --config config.ini
    python -m debias_spark.cli --input in/ --output out/ [--partitioned]

Runs scan -> annotate -> JSON sink and prints a per-file summary (the
reference's log lines, call-debias.py:151,157).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from debias_spark.pipeline import PipelineConfig, run_pipeline
from debias_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="debias-spark")
    p.add_argument("--config", help="config.ini path ([settings] section)")
    p.add_argument("--input", help="input corpus dir (input/<lang>/*.csv)")
    p.add_argument("--output", help="output dir for JSON results")
    p.add_argument("--max-retries", type=int, default=5)
    p.add_argument(
        "--partitioned",
        action="store_true",
        help="distributed language-partitioned NDJSON sink instead of "
        "per-file '<stem>-output.json' documents",
    )
    args = p.parse_args(argv)

    if args.config:
        cfg = PipelineConfig.from_ini(args.config)
    elif args.input and args.output:
        cfg = PipelineConfig(args.input, args.output, max_retries=args.max_retries)
    else:
        p.error("either --config or both --input and --output are required")

    spark = get_spark("debias-spark-cli")
    annotated = run_pipeline(spark, cfg, per_file_compat=not args.partitioned)
    summary = (
        annotated.groupBy("src_file", "language")
        .agg(
            F.count("*").alias("records"),
            F.sum((F.size("tags") > 0).cast("int")).alias("flagged"),
            F.sum(F.when(F.col("_error").isNotNull(), 1).otherwise(0)).alias("errors"),
        )
        .orderBy("src_file")
        .collect()
    )
    for r in summary:
        print(
            f"{r.src_file} [{r.language}]: {r.records} records, "
            f"{r.flagged} flagged, {r.errors} errors"
        )
    print(f"wrote outputs to {cfg.output_folder}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
