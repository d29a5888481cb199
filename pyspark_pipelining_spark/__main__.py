"""Command-line entry point: run a pipeline supertask end-to-end.

The reference was driven by Luigi's CLI (``metrics/tasks/*`` — SURVEY
§2.11); the rebuild's equivalent is::

    python -m pyspark_pipelining_spark metrics --sf-dir /data/sf0.01 \
        --output /tmp/out --run-id nightly
    python -m pyspark_pipelining_spark corpus  --sf-dir /data/sf0.01 \
        --output /tmp/out --run-id epoch0

Each named pipeline resolves to a stage DAG (plans/dag.py) with
parquet-existence idempotency, so re-running a finished job is a no-op
and a crashed job resumes from its last materialized stage.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="pyspark_pipelining_spark")
    ap.add_argument("pipeline", choices=["metrics", "corpus"])
    ap.add_argument("--sf-dir", required=True, help="testdata/table directory")
    ap.add_argument("--output", required=True, help="materialization root")
    ap.add_argument("--run-id", default="dev")
    ap.add_argument("--master", default=None, help="Spark master override")
    ap.add_argument(
        "--stage", default=None, help="run one stage (and its upstream) instead of all"
    )
    return ap


def main(argv: list[str] | None = None) -> dict:
    """Run the chosen pipeline; returns {stage: row_count} for scripting."""
    args = build_parser().parse_args(argv)

    from pyspark_pipelining_spark.plans import PipelineConfig
    from pyspark_pipelining_spark.plans.dag import (
        build_corpus_pipeline,
        build_metrics_pipeline,
    )
    from pyspark_pipelining_spark.session import get_spark

    spark = get_spark(app_name=f"pipeline-{args.pipeline}", master=args.master)
    cfg = PipelineConfig(
        sf_dir=args.sf_dir, output_path=args.output, run_id=args.run_id
    )
    build = build_metrics_pipeline if args.pipeline == "metrics" else build_corpus_pipeline
    p = build(spark, cfg)
    if args.stage:
        results = {args.stage: p.run(args.stage)}
    else:
        results = p.run_all()
    counts = {name: df.count() for name, df in results.items()}
    for name, n in sorted(counts.items()):
        print(f"{name}: {n} rows")
    return counts


if __name__ == "__main__":
    main()
