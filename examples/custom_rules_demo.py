"""Library-composition example: define custom quality rules, run them
through the engine, and compute the health score (the rebuild's twin of
the reference's custom_rules_demo.py example).

    python examples/custom_rules_demo.py [path/to/table.parquet]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main(path: str = "/root/testdata/sf0.001/documents.parquet") -> dict:
    from datacanary_spark.analysis.summary import get_health_score
    from datacanary_spark.operators.profiler import analyse_dataframe
    from datacanary_spark.rules.builtin import (
        NullPercentageRule,
        PatternMatchRule,
        ValueRangeRule,
    )
    from datacanary_spark.rules.engine import RuleEngine
    from datacanary_spark.session import get_spark
    from datacanary_spark.sources.io import read_table

    spark = get_spark(app_name="example_custom_rules")
    df = read_table(spark, path)
    profile = analyse_dataframe(df)

    engine = RuleEngine()
    engine.add_rule(NullPercentageRule(threshold=1.0))          # strict nulls
    engine.add_rule(ValueRangeRule(min_value=0))                # non-negative
    engine.add_rule(PatternMatchRule(r"^src[0-9]+$", name="source_format"))
    results = engine.evaluate_profile(profile, df=df)

    for col, verdicts in results.items():
        for v in verdicts:
            mark = "PASS" if v["result"]["passed"] else "FAIL"
            print(f"{mark}  {col:10s} {v['rule_name']:22s} "
                  f"{v['result']['message']}")
    health = get_health_score(results, profile)
    print(f"health: {health['health_score']} ({health['health_status']})")
    return results


if __name__ == "__main__":
    main(*sys.argv[1:])
