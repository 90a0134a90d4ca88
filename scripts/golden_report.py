"""Golden-metrics report: Spark pipeline vs the pure-pandas golden twin
over a fresh fixture corpus (bigger + different seed than the unit
tests). Writes BENCH/GOLDEN.json:

    {"n_docs": N, "keep_f1": …, "keep_accuracy": …,
     "scrub_byte_identical_rate": …, "lang_pred_match_rate": …,
     "rule_hits_match_rate": …}

This is the quantitative evidence for the north rule's F1 ≥ 0.99 /
byte-identity criteria, on data neither implementation was tuned on.

Usage: python scripts/golden_report.py [--docs 3000] [--seed 20260816]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=3000)
    p.add_argument("--seed", type=int, default=20260816)
    p.add_argument("--out", default="BENCH/GOLDEN.json")
    args = p.parse_args()

    from datacanary_spark.golden import f1_score, golden_labels
    from datacanary_spark.plans.pipeline import broadcast_models, filter_pages
    from datacanary_spark.session import get_spark
    from datacanary_spark.sources.fixtures import generate_pages_pandas, pages_spark_df

    spark = get_spark(app_name="golden_report")

    pages_pd = generate_pages_pandas(args.docs, seed=args.seed)
    golden = golden_labels(pages_pd).set_index("url")

    pages = pages_spark_df(spark, args.docs, seed=args.seed)
    verdicts = filter_pages(pages, broadcast_models(spark)).toPandas() \
        .set_index("url")

    assert set(verdicts.index) == set(golden.index)
    v = verdicts.loc[golden.index]

    keep_f1 = f1_score(v["keep"], golden["keep"])
    keep_acc = float((v["keep"] == golden["keep"]).mean())
    scrub_ok = float((v["scrubbed_text"] == golden["scrubbed_text"]).mean())
    lang_ok = float((v["lang_pred"] == golden["lang_pred"]).mean())
    hits_ok = float(sum(
        dict(a) == dict(b) for a, b in zip(v["rule_hits"], golden["rule_hits"])
    ) / len(v))

    report = {
        "n_docs": args.docs,
        "seed": args.seed,
        "keep_f1": round(keep_f1, 6),
        "keep_accuracy": round(keep_acc, 6),
        "scrub_byte_identical_rate": round(scrub_ok, 6),
        "lang_pred_match_rate": round(lang_ok, 6),
        "rule_hits_match_rate": round(hits_ok, 6),
        "targets": {"keep_f1": 0.99, "scrub_byte_identical_rate": 1.0},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
