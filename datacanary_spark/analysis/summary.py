"""Dataset summary + health score — semantic ports of the reference's
``SummaryStatistics`` (/root/reference/src/datacanary/analysis/
summary_statistics.py:16-154).

The profile these operate on is tiny (one entry per column), so this is
driver-side Python, same as the reference — the heavy lifting already
happened in the single-pass Spark profile aggregation.

Preserved quirks: lowest_unique_column ignores 0%-unique columns
(:59-60); averages include columns missing the stat as 0 (dict.get
default); all 2dp rounding is Python round (banker's) like the
reference; health = 0.7*rule_compliance + 0.3*completeness with bands
90/75/60 (:124-140).
"""

from __future__ import annotations

from typing import Any


def calculate_summary(profile: dict[str, dict[str, Any]]) -> dict[str, Any]:
    if not profile:
        return {}
    total_columns = len(profile)
    column_types: dict[str, int] = {}
    total_null = 0.0
    total_unique = 0.0
    columns_with_nulls = 0
    highest_null = {"name": None, "percentage": 0}
    lowest_unique = {"name": None, "percentage": 100}

    for name, data in profile.items():
        ctype = data.get("type", "unknown")
        stats = data.get("stats", {})
        column_types[ctype] = column_types.get(ctype, 0) + 1
        null_pct = stats.get("null_percentage", 0) or 0
        total_null += null_pct
        if null_pct > 0:
            columns_with_nulls += 1
        if null_pct > highest_null["percentage"]:
            highest_null = {"name": name, "percentage": null_pct}
        unique_pct = stats.get("unique_percentage", 0) or 0
        total_unique += unique_pct
        if 0 < unique_pct < lowest_unique["percentage"]:
            lowest_unique = {"name": name, "percentage": unique_pct}

    avg_null = total_null / total_columns
    avg_unique = total_unique / total_columns
    return {
        "dataset_statistics": {
            "total_columns": total_columns,
            "column_types": column_types,
            "columns_with_nulls": columns_with_nulls,
            "columns_with_nulls_percentage":
                round(columns_with_nulls / total_columns * 100, 2),
            "avg_null_percentage": round(avg_null, 2),
            "avg_unique_percentage": round(avg_unique, 2),
        },
        "data_quality_indicators": {
            "completeness": round(100 - avg_null, 2),
            "uniqueness": round(avg_unique, 2),
        },
        "notable_columns": {
            "highest_null_column": highest_null,
            "lowest_unique_column": lowest_unique,
        },
    }


def get_health_score(rule_results: dict[str, list[dict[str, Any]]],
                     profile: dict[str, dict[str, Any]]) -> dict[str, Any]:
    summary = calculate_summary(profile)
    total_rules = 0
    passed_rules = 0
    column_scores: dict[str, float] = {}
    for column, rules in rule_results.items():
        n = len(rules)
        p = sum(1 for r in rules if r["result"].get("passed", False))
        total_rules += n
        passed_rules += p
        if n > 0:
            column_scores[column] = round(p / n * 100, 2)
    rule_compliance = round(passed_rules / total_rules * 100, 2) if total_rules else 0
    completeness = (summary.get("data_quality_indicators", {})
                    .get("completeness", 0))
    health_score = round(rule_compliance * 0.7 + completeness * 0.3, 2)
    health_status = ("Excellent" if health_score >= 90 else
                     "Good" if health_score >= 75 else
                     "Fair" if health_score >= 60 else "Poor")
    return {
        "health_score": health_score,
        "health_status": health_status,
        "components": {"rule_compliance": rule_compliance,
                       "completeness": completeness},
        "column_scores": column_scores,
    }
