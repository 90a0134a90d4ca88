"""YAML/JSON rule-config loader — port of the reference's
``rule_config.py`` (/root/reference/src/datacanary/config/
rule_config.py:16-115): same file formats, same ``{rules: [{type, ...}]}``
shape, same type strings (null_percentage / unique_value / value_range /
pattern_match), same defaults, unknown types and invalid entries skipped
with a warning rather than raising.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any

from datacanary_spark.rules.base import Rule
from datacanary_spark.rules.builtin import (
    NullPercentageRule,
    PatternMatchRule,
    UniqueValueRule,
    ValueRangeRule,
)

logger = logging.getLogger(__name__)


def create_rule_from_config(rule_config: dict[str, Any]) -> Rule | None:
    if "type" not in rule_config:
        logger.warning("rule config missing 'type' key, skipping")
        return None
    rule_type = rule_config["type"]
    try:
        if rule_type == "null_percentage":
            return NullPercentageRule(threshold=rule_config.get("threshold", 5.0))
        if rule_type == "unique_value":
            return UniqueValueRule(threshold=rule_config.get("threshold", 90.0))
        if rule_type == "value_range":
            return ValueRangeRule(min_value=rule_config.get("min_value"),
                                  max_value=rule_config.get("max_value"))
        if rule_type == "pattern_match":
            pattern = rule_config.get("pattern")
            if not pattern:
                logger.warning("pattern_match rule missing 'pattern', skipping")
                return None
            return PatternMatchRule(pattern=pattern,
                                    name=rule_config.get("name"),
                                    description=rule_config.get("description"))
        logger.warning("unknown rule type: %s", rule_type)
        return None
    except Exception as e:
        logger.error("error creating rule of type %s: %s", rule_type, e)
        return None


def load_rules_from_file(file_path: str) -> list[Rule]:
    if not os.path.exists(file_path):
        raise FileNotFoundError(f"Rule configuration file not found: {file_path}")
    ext = os.path.splitext(file_path)[1].lower()
    if ext in (".yaml", ".yml"):
        import yaml

        with open(file_path) as f:
            config = yaml.safe_load(f)
    elif ext == ".json":
        with open(file_path) as f:
            config = json.load(f)
    else:
        raise ValueError(f"Unsupported file extension: {ext}. "
                         f"Use .yaml, .yml, or .json")
    if not isinstance(config, dict) or "rules" not in config:
        raise ValueError("Invalid configuration format: missing 'rules' key")
    rules = []
    for rule_config in config["rules"]:
        rule = create_rule_from_config(rule_config)
        if rule:
            rules.append(rule)
    return rules


def apply_rules_to_engine(rule_engine, file_path: str) -> None:
    for rule in load_rules_from_file(file_path):
        rule_engine.add_rule(rule)
