"""Built-in rules — semantic ports of the reference's four rules
(/root/reference/src/datacanary/rules/rule_engine.py:64-316), with the
same names, defaults, applicability, thresholds-inclusive comparisons and
verdict dict shapes (the shapes matter: reporting and tests consume them).

One deliberate strengthening: ``PatternMatchRule`` in the reference
checks ≤10 UNSEEDED random sample values with ``re.match`` (:294-300) —
nondeterministic verdicts. Here the profile's sample_values are
deterministic, and when the engine is given the DataFrame the rule
evaluates over ALL rows JVM-side (``rlike`` on an anchored pattern) in a
single aggregate — deterministic and scale-correct (SURVEY.md §1.3).
"""

from __future__ import annotations

import re
from typing import Any

from datacanary_spark.rules.base import Rule


class NullPercentageRule(Rule):
    """Pass iff null_percentage <= threshold (rule_engine.py:64-108).
    Compares the 2dp-banker's-rounded profile value, like the reference."""

    def __init__(self, threshold: float = 5.0):
        super().__init__(
            name="null_percentage_check",
            description=f"Check if null percentage is below {threshold}%",
            applicable_types=None,
        )
        self.threshold = threshold

    def evaluate(self, column_profile: dict[str, Any]) -> dict[str, Any]:
        stats = column_profile.get("stats", {})
        if "null_percentage" not in stats:
            return self._missing("null_percentage")
        actual = stats["null_percentage"]
        return {
            "passed": actual <= self.threshold,
            "actual": actual,
            "threshold": self.threshold,
            "message": f"Column has {actual:.2f}% nulls "
                       f"(threshold: {self.threshold}%)",
        }


class UniqueValueRule(Rule):
    """Pass iff unique_percentage >= threshold (rule_engine.py:110-154)."""

    def __init__(self, threshold: float = 90.0):
        super().__init__(
            name="unique_value_check",
            description=f"Check if unique value percentage is above {threshold}%",
            applicable_types=None,
        )
        self.threshold = threshold

    def evaluate(self, column_profile: dict[str, Any]) -> dict[str, Any]:
        stats = column_profile.get("stats", {})
        if "unique_percentage" not in stats:
            return self._missing("unique_percentage")
        actual = stats["unique_percentage"]
        return {
            "passed": actual >= self.threshold,
            "actual": actual,
            "threshold": self.threshold,
            "message": f"Column has {actual:.2f}% unique values "
                       f"(threshold: {self.threshold}%)",
        }


class ValueRangeRule(Rule):
    """Pass iff profile min/max within [min_value, max_value]; numeric
    only (rule_engine.py:156-235)."""

    def __init__(self, min_value=None, max_value=None):
        if min_value is not None and max_value is not None:
            description = f"Check if values are between {min_value} and {max_value}"
        elif min_value is not None:
            description = f"Check if values are at least {min_value}"
        elif max_value is not None:
            description = f"Check if values are at most {max_value}"
        else:
            description = "Check if values are within range"
        super().__init__(
            name="value_range_check",
            description=description,
            applicable_types=["int", "float", "numeric"],
        )
        self.min_value = min_value
        self.max_value = max_value

    def evaluate(self, column_profile: dict[str, Any]) -> dict[str, Any]:
        stats = column_profile.get("stats", {})
        if "min" not in stats or "max" not in stats:
            return self._missing("min", "max")
        lo, hi = stats["min"], stats["max"]
        passed = ((self.min_value is None or lo >= self.min_value)
                  and (self.max_value is None or hi <= self.max_value))
        if self.min_value is not None and self.max_value is not None:
            message = (f"Values range from {lo} to {hi} "
                       f"(expected: {self.min_value} to {self.max_value})")
        elif self.min_value is not None:
            message = f"Minimum value is {lo} (expected at least {self.min_value})"
        elif self.max_value is not None:
            message = f"Maximum value is {hi} (expected at most {self.max_value})"
        else:
            message = f"Values range from {lo} to {hi}"
        return {
            "passed": passed,
            "actual_min": lo,
            "actual_max": hi,
            "expected_min": self.min_value,
            "expected_max": self.max_value,
            "message": message,
        }


class PatternMatchRule(Rule):
    """String values must match a regex (anchored at start, like
    ``re.match`` — rule_engine.py:294-300). Profile mode checks the
    deterministic sample_values; full-data mode (engine + DataFrame)
    counts non-matching rows over the whole column."""

    def __init__(self, pattern: str, name: str | None = None,
                 description: str | None = None):
        super().__init__(
            name=name or "pattern_match_rule",
            description=description or f"Check if values match pattern: {pattern}",
            applicable_types=["object", "string"],
        )
        self.pattern = pattern
        try:
            self.compiled_pattern: re.Pattern | None = re.compile(pattern)
        except re.error:
            self.compiled_pattern = None

    def evaluate(self, column_profile: dict[str, Any]) -> dict[str, Any]:
        if self.compiled_pattern is None:
            return {
                "passed": False,
                "reason": "Invalid pattern",
                "details": f"The pattern '{self.pattern}' is not a valid "
                           f"regular expression",
            }
        stats = column_profile.get("stats", {})
        if "sample_values" not in stats:
            return self._missing("sample_values")
        invalid = [v for v in stats["sample_values"]
                   if v is not None and v != ""
                   and not self.compiled_pattern.match(str(v))]
        return self._verdict(len(invalid), invalid[:5])

    def _verdict(self, invalid_count: int, examples: list) -> dict[str, Any]:
        passed = invalid_count == 0
        if passed:
            message = f"All sample values match pattern: {self.pattern}"
        else:
            message = (f"{invalid_count} sample values do not match pattern: "
                       f"{self.pattern}")
            if examples:
                message += f" (examples: {examples[:3]})"
        return {
            "passed": passed,
            "pattern": self.pattern,
            "invalid_count": invalid_count,
            "invalid_samples": examples,
            "message": message,
        }

    # ---- full-data mode (Spark-side, deterministic) ----

    def full_data_expr(self, column: str):
        """Aggregate expression counting rows that DON'T match (non-null,
        non-empty rows only, mirroring the sample filter :296)."""
        from pyspark.sql import functions as F

        col = F.col(column)
        candidate = col.isNotNull() & (col != "")
        # rlike is unanchored; '^(?:...)' emulates Python re.match
        nomatch = candidate & ~col.rlike(f"^(?:{self.pattern})")
        return F.sum(nomatch.cast("long"))
