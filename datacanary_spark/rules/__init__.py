"""Profile-level quality rules (reference parity) — see rules.engine."""

from datacanary_spark.rules.base import Rule
from datacanary_spark.rules.builtin import (
    NullPercentageRule,
    PatternMatchRule,
    UniqueValueRule,
    ValueRangeRule,
)
from datacanary_spark.rules.engine import RuleEngine, default_rules

__all__ = ["Rule", "NullPercentageRule", "UniqueValueRule", "ValueRangeRule",
           "PatternMatchRule", "RuleEngine", "default_rules"]
