"""CLI — mirrors the reference's command surface
(/root/reference/src/datacanary/__main__.py:53-137: analyse / check +
local variants) and adds the engine's own jobs:

    python -m datacanary_spark analyse --file <parquet> [--output out.json]
    python -m datacanary_spark check   --file <parquet> [--rules rules.yaml]
                                       [--report out.txt] [--json out.json]
    python -m datacanary_spark filter  --input <pages dir> --output <dir>
                                       [--chunks N] [--buckets N] [--from-html]
    python -m datacanary_spark gen-pages --output <dir> --docs N [--seed 42]
    python -m datacanary_spark package [--dest dist/]   # py-files zip

spark-submit usage (multi-executor):
    spark-submit --py-files dist/datacanary_spark.zip jobs/filter_job.py \
        --input s3a://bucket/pages --output s3a://bucket/filtered

Unlike the reference, `--json` works on every command (its check-local
dumps `args.key` which the parser never defines — __main__.py:593 vs
:112-116 — a crash we deliberately do not replicate).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from datacanary_spark.session import get_spark

    return get_spark(app_name=f"datacanary_{args.command}",
                     master=getattr(args, "master", None))


def cmd_analyse(args) -> int:
    from datacanary_spark.operators.profiler import analyse_dataframe

    spark = _spark(args)
    df = spark.read.parquet(args.file)
    profile = analyse_dataframe(df, approx=args.approx)
    _print_profile(profile)
    if args.output:
        with open(args.output, "w") as f:
            json.dump({"dataset": args.file, "profile": profile}, f,
                      indent=2, default=str)
        print(f"\nJSON written to {args.output}")
    return 0


def cmd_check(args) -> int:
    from datacanary_spark.analysis.insights import get_data_insights
    from datacanary_spark.analysis.summary import calculate_summary, get_health_score
    from datacanary_spark.operators.profiler import analyse_dataframe
    from datacanary_spark.reporting import generate_text_report
    from datacanary_spark.rules.config import load_rules_from_file
    from datacanary_spark.rules.engine import RuleEngine, default_rules

    spark = _spark(args)
    df = spark.read.parquet(args.file)
    profile = analyse_dataframe(df, approx=args.approx)

    engine = RuleEngine()
    rules = load_rules_from_file(args.rules) if args.rules else default_rules()
    for r in rules:
        engine.add_rule(r)
    results = engine.evaluate_profile(profile)

    summary = calculate_summary(profile)
    health = get_health_score(results, profile)
    insights = get_data_insights(profile, results)
    report = generate_text_report(args.file, profile, results,
                                  summary=summary, health=health,
                                  insights=insights)
    if args.report:
        with open(args.report, "w") as f:
            f.write(report)
        print(f"report written to {args.report}")
    else:
        print(report)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"dataset": args.file, "profile": profile,
                       "rules": results, "summary": summary,
                       "health": health, "insights": insights},
                      f, indent=2, default=str)
        print(f"JSON written to {args.json}")
    all_passed = all(r["result"]["passed"] for col in results.values() for r in col)
    return 0 if all_passed else 1


def cmd_filter(args) -> int:
    from datacanary_spark.plans.checkpoint import run_filter_job

    spark = _spark(args)
    summary = run_filter_job(
        spark, args.input, args.output,
        n_chunks=args.chunks,
        repartition_buckets=args.buckets,
        extract_from_html=args.from_html,
    )
    print(json.dumps(summary))
    return 0


def cmd_gen_pages(args) -> int:
    import math

    from datacanary_spark.sources.fixtures import write_pages_parquet

    chunk = math.ceil(args.docs / args.files)
    write_pages_parquet(args.output, args.docs, seed=args.seed, chunk_size=chunk)
    print(f"wrote {args.docs} pages to {args.output} ({args.files} files)")
    return 0


def cmd_package(args) -> int:
    """Build the --py-files zip for spark-submit."""
    import os
    import zipfile

    import datacanary_spark

    pkg_dir = os.path.dirname(datacanary_spark.__file__)
    os.makedirs(args.dest, exist_ok=True)
    zip_path = os.path.join(args.dest, "datacanary_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    print(zip_path)
    return 0


def _print_profile(profile: dict) -> None:
    for col, info in profile.items():
        print(f"\n== {col} ({info['type']})")
        for stat, val in sorted(info["stats"].items()):
            print(f"   {stat}: {val}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="datacanary_spark")
    p.add_argument("--master", default=None, help="spark master override")
    sub = p.add_subparsers(dest="command", required=True)

    a = sub.add_parser("analyse", help="profile a parquet dataset")
    a.add_argument("--file", required=True)
    a.add_argument("--output", default=None, help="write profile JSON here")
    a.add_argument("--approx", action="store_true",
                   help="HLL distinct counts (10^12-row mode)")
    a.set_defaults(fn=cmd_analyse)

    c = sub.add_parser("check", help="profile + rule verdicts + report")
    c.add_argument("--file", required=True)
    c.add_argument("--rules", default=None, help="YAML/JSON rule config")
    c.add_argument("--report", default=None)
    c.add_argument("--json", default=None)
    c.add_argument("--approx", action="store_true")
    c.set_defaults(fn=cmd_check)

    f = sub.add_parser("filter", help="web-text quality-filter job")
    f.add_argument("--input", required=True)
    f.add_argument("--output", required=True)
    f.add_argument("--chunks", type=int, default=4)
    f.add_argument("--buckets", type=int, default=None)
    f.add_argument("--from-html", action="store_true")
    f.set_defaults(fn=cmd_filter)

    g = sub.add_parser("gen-pages", help="deterministic pages fixture")
    g.add_argument("--output", required=True)
    g.add_argument("--docs", type=int, required=True)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--files", type=int, default=8, help="number of parquet files")
    g.set_defaults(fn=cmd_gen_pages)

    z = sub.add_parser("package", help="build --py-files zip")
    z.add_argument("--dest", default="dist")
    z.set_defaults(fn=cmd_package)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
