"""CLI entry point — the 'switch from the reference' surface.

    python -m hse_etl_ochirov_aldar_spark list
    python -m hse_etl_ochirov_aldar_spark run <query> [--sf-dir DIR] [-n 20]
    python -m hse_etl_ochirov_aldar_spark pipeline [--sf-dir DIR] --out DIR

`run` executes any catalog query and shows the result; `pipeline`
materializes the layered raw -> clean -> mart flow (the reference's
end-to-end DAG output) as partitioned parquet under --out.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hse_etl_ochirov_aldar_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list catalog queries")
    p_run = sub.add_parser("run", help="run one catalog query")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("-n", type=int, default=20, help="rows to show")
    p_pipe = sub.add_parser("pipeline", help="materialize raw->clean->mart")
    p_pipe.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_pipe.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    from .queries import ORACLES, QUERIES

    if args.cmd == "list":
        for name in QUERIES:
            kind = "oracle" if name in ORACLES else "rows-only"
            print(f"{name}\t[{kind}]")
        return 0

    from .session import get_spark

    spark = get_spark(app_name=f"cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "run":
        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        df = QUERIES[args.query](spark, args.sf_dir)
        df.show(args.n, truncate=False)
        print(f"rows: {df.count()}")
        return 0

    # pipeline: events -> clean (percentile-trimmed, month-partitioned)
    # -> daily mart + extremes mart, with validation gates
    from pyspark.sql import functions as F

    from .operators.aggregates import daily_avg
    from .operators.topk import topk_extremes
    from .plans.quality import expect_nonempty
    from .queries import _events_base
    from .operators.percentile import percentile_trim
    from .sources.sinks import write_overwrite, write_partitioned

    base = _events_base(spark, args.sf_dir)
    clean = percentile_trim(base, "value").withColumn(
        "month", F.date_format("day", "yyyy-MM")
    )
    write_partitioned(expect_nonempty(clean, "clean"), f"{args.out}/clean_events", "month")
    daily = daily_avg(spark.read.parquet(f"{args.out}/clean_events"))
    write_overwrite(expect_nonempty(daily, "daily"), f"{args.out}/daily_avg")
    extremes = topk_extremes(spark.read.parquet(f"{args.out}/daily_avg"))
    write_overwrite(expect_nonempty(extremes, "extremes"), f"{args.out}/daily_extremes")
    for layer in ("clean_events", "daily_avg", "daily_extremes"):
        n = spark.read.parquet(f"{args.out}/{layer}").count()
        print(f"{layer}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
