"""Rule engine — port of the reference's RuleEngine
(/root/reference/src/datacanary/rules/rule_engine.py:318-402):

* applicability enforced in the evaluation loop (:352-355),
* per-rule error containment — an exception records
  ``passed: False, reason: "Evaluation error"`` instead of aborting
  (:368-378),
* result shape ``{column: [{rule_name, description, result}]}``.

Additions: ``evaluate_profile(profile, df=None)`` — when the source
DataFrame is supplied, PatternMatchRules are evaluated over ALL rows in
ONE Spark aggregate (all pattern rules × all applicable string columns
batched into a single scan) instead of the reference's 10 unseeded
samples. At 10^12 rows this is one extra columnar pass, fully
pushdown/codegen-friendly.
"""

from __future__ import annotations

import logging
from typing import Any

from datacanary_spark.rules.base import Rule
from datacanary_spark.rules.builtin import (
    NullPercentageRule,
    PatternMatchRule,
    UniqueValueRule,
    ValueRangeRule,
)

logger = logging.getLogger(__name__)


def default_rules() -> list[Rule]:
    """The reference's default set when no config is given
    (__main__.py:406-409, duplicated at :529-533)."""
    return [NullPercentageRule(threshold=5.0),
            UniqueValueRule(threshold=90.0),
            ValueRangeRule(min_value=0)]


class RuleEngine:
    def __init__(self) -> None:
        self.rules: list[Rule] = []

    def add_rule(self, rule: Rule) -> None:
        self.rules.append(rule)

    # -- profile-level evaluation (reference parity) -----------------------

    def evaluate_column(self, column_name: str,
                        column_profile: dict[str, Any],
                        full_counts: dict[tuple[str, int], int] | None = None,
                        ) -> list[dict[str, Any]]:
        results = []
        for i, rule in enumerate(self.rules):
            if not rule.is_applicable(column_profile):
                continue
            try:
                if (full_counts is not None
                        and isinstance(rule, PatternMatchRule)
                        and (column_name, i) in full_counts):
                    count = full_counts[(column_name, i)]
                    if isinstance(count, Exception):
                        # full-data evaluation of THIS rule failed
                        # (e.g. Python-valid but Java-invalid regex);
                        # re-raise inside the containment block so only
                        # this rule records the error verdict.
                        raise count
                    result = rule._verdict(count, [])
                else:
                    result = rule.evaluate(column_profile)
            except Exception as e:  # per-rule containment (:368-378)
                logger.error("rule %s failed on %s: %s", rule.name, column_name, e)
                result = {"passed": False, "reason": "Evaluation error",
                          "details": str(e)}
            results.append({"rule_name": rule.name,
                            "description": rule.description,
                            "result": result})
        return results

    def evaluate_profile(self, profile: dict[str, dict[str, Any]],
                         df=None) -> dict[str, list[dict[str, Any]]]:
        """Evaluate all rules for all columns. With ``df`` given, pattern
        rules run full-data in one Spark aggregate."""
        full_counts = self._full_pattern_counts(profile, df) if df is not None else None
        return {col: self.evaluate_column(col, col_profile, full_counts)
                for col, col_profile in profile.items()}

    # reference API name (rule_engine.py:387) kept as an alias
    evaluate_dataframe = evaluate_profile

    def _full_pattern_counts(self, profile, df) -> dict[tuple[str, int], Any]:
        """ONE agg computing every (pattern rule × string column) nomatch
        count. Per-rule containment survives the batching: if the single
        batched agg fails (one Python-valid/Java-invalid regex would
        otherwise abort every rule), each expression re-runs as its own
        agg and only the offending rules map to their Exception, which
        ``evaluate_column`` converts to that rule's error verdict."""
        exprs = []
        keys: list[tuple[str, int]] = []
        for col, col_profile in profile.items():
            if col not in df.columns:
                continue
            for i, rule in enumerate(self.rules):
                if (isinstance(rule, PatternMatchRule)
                        and rule.compiled_pattern is not None
                        and rule.is_applicable(col_profile)):
                    exprs.append(rule.full_data_expr(col).alias(f"c{len(keys)}"))
                    keys.append((col, i))
        if not exprs:
            return {}
        try:
            row = df.agg(*exprs).collect()[0]
            return {k: int(row[f"c{j}"] or 0) for j, k in enumerate(keys)}
        except Exception:
            # fallback: one scan per pattern rule, but only on the
            # (rare) path where some rule's regex breaks the batch —
            # the happy path stays a single aggregate.
            out: dict[tuple[str, int], Any] = {}
            for j, k in enumerate(keys):
                try:
                    row = df.agg(exprs[j]).collect()[0]
                    out[k] = int(row[f"c{j}"] or 0)
                except Exception as e:
                    logger.error("full-data pattern rule %s on %s failed: %s",
                                 self.rules[k[1]].name, k[0], e)
                    out[k] = e
            return out
