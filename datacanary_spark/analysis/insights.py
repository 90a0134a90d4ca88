"""Outlier / skewness / insight detection — semantic ports of the
reference's ``TrendDetector`` (/root/reference/src/datacanary/analysis/
trend_detection.py:16-215).

Thresholds preserved exactly: outlier if |z| of profile min or max > 3
(skip std_dev < 1e-10); skew bands at 5% / 15% relative mean-median
difference; "high null" > 10%; "low uniqueness" < 1% with count ≥ 100.
Driver-side over the tiny profile dict, like the reference.
"""

from __future__ import annotations

from typing import Any


def _is_numeric(ctype: str) -> bool:
    return ctype.startswith("int") or ctype.startswith("float")


def detect_outliers(profile: dict[str, dict[str, Any]]) -> dict[str, list[dict]]:
    outliers: dict[str, list[dict]] = {}
    for name, data in profile.items():
        if not _is_numeric(data.get("type", "unknown")):
            continue
        stats = data.get("stats", {})
        if "mean" not in stats or "std_dev" not in stats:
            continue
        mean, std = stats["mean"], stats["std_dev"]
        if mean is None or std is None or std < 1e-10:
            continue
        found = []
        for kind in ("minimum", "maximum"):
            val = stats.get("min" if kind == "minimum" else "max")
            z = abs((val - mean) / std) if val is not None else 0
            if z > 3:
                found.append({"value": val, "z_score": round(z, 2), "type": kind})
        if found:
            outliers[name] = found
    return outliers


def detect_distribution_skewness(profile: dict[str, dict[str, Any]]) -> dict[str, dict]:
    skewness: dict[str, dict] = {}
    for name, data in profile.items():
        if not _is_numeric(data.get("type", "unknown")):
            continue
        stats = data.get("stats", {})
        if "mean" not in stats or "median" not in stats:
            continue
        mean, median = stats["mean"], stats["median"]
        if mean is None or median is None or abs(mean - median) < 1e-10:
            continue
        direction = "right-skewed" if mean > median else "left-skewed"
        diff_pct = abs(mean - median) / max(abs(mean), abs(median), 1e-10) * 100
        strength = ("mild" if diff_pct < 5 else
                    "moderate" if diff_pct < 15 else "strong")
        skewness[name] = {
            "direction": direction,
            "strength": strength,
            "mean": mean,
            "median": median,
            "difference_percentage": round(diff_pct, 2),
        }
    return skewness


def get_data_insights(profile: dict[str, dict[str, Any]]) -> dict[str, Any]:
    outliers = detect_outliers(profile)
    skewness = detect_distribution_skewness(profile)

    high_null = {name: data.get("stats", {}).get("null_percentage", 0)
                 for name, data in profile.items()
                 if (data.get("stats", {}).get("null_percentage", 0) or 0) > 10}
    low_unique = {name: data.get("stats", {}).get("unique_percentage", 0)
                  for name, data in profile.items()
                  if (data.get("stats", {}).get("count", 0) or 0) >= 100
                  and (data.get("stats", {}).get("unique_percentage", 100) or 0) < 1}

    summary: list[str] = []
    recommendations: list[str] = []
    if outliers:
        summary.append(f"Found potential outliers in {len(outliers)} columns.")
        recommendations.append(
            "Consider investigating outlier values for data entry errors.")
    if skewness:
        n_skewed = sum(1 for i in skewness.values()
                       if i["strength"] in ("moderate", "strong"))
        if n_skewed > 0:
            summary.append(f"Found {n_skewed} columns with significant skewness.")
            recommendations.append(
                "Consider transformations (e.g., log) for strongly skewed "
                "numeric columns.")
    if high_null:
        summary.append(f"Found {len(high_null)} columns with high null percentages.")
        recommendations.append(
            "Review data collection process for columns with many nulls.")
    if low_unique:
        summary.append(f"Found {len(low_unique)} columns with very low uniqueness.")
        recommendations.append(
            "Check if low-uniqueness columns should be categorical rather "
            "than continuous.")

    return {
        "outliers": outliers,
        "skewness": skewness,
        "data_quality_issues": {
            "high_null_columns": high_null,
            "low_unique_columns": low_unique,
        },
        "summary": summary,
        "recommendations": recommendations,
    }
