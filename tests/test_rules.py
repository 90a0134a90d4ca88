"""Rule engine, config, summary/health/insights, report parity tests.

Ports the reference's fixtures: profile dicts from
/root/reference/src/tests/test_rule_engine.py:92-111, config shapes from
src/examples/advanced_rules.yaml, report substrings from
src/tests/test_report_generation.py:44-62.
"""

from __future__ import annotations

import json

import pytest

from datacanary_spark.analysis.insights import (
    detect_distribution_skewness,
    detect_outliers,
    get_data_insights,
)
from datacanary_spark.analysis.summary import calculate_summary, get_health_score
from datacanary_spark.reporting import generate_text_report
from datacanary_spark.rules import (
    NullPercentageRule,
    PatternMatchRule,
    RuleEngine,
    UniqueValueRule,
    ValueRangeRule,
    default_rules,
)
from datacanary_spark.rules.config import create_rule_from_config, load_rules_from_file

# F4 fixture: reference test_rule_engine.py:92-111
PROFILE = {
    "id_column": {
        "type": "int64",
        "stats": {"count": 100, "null_count": 0, "null_percentage": 0.0,
                  "unique_count": 100, "unique_percentage": 100.0,
                  "min": 1, "max": 100, "mean": 50.5, "median": 50.5,
                  "std_dev": 29.0, "sample_values": []},
    },
    "value_column": {
        "type": "float64",
        "stats": {"count": 100, "null_count": 10, "null_percentage": 10.0,
                  "unique_count": 50, "unique_percentage": 50.0,
                  "min": 0.0, "max": 1000.0, "mean": 500.0, "median": 450.0,
                  "std_dev": 250.0, "sample_values": []},
    },
}


def test_null_percentage_rule():
    rule = NullPercentageRule(threshold=5.0)
    assert rule.evaluate(PROFILE["id_column"])["passed"] is True
    r = rule.evaluate(PROFILE["value_column"])
    assert r["passed"] is False and r["actual"] == 10.0 and r["threshold"] == 5.0


def test_unique_value_rule():
    rule = UniqueValueRule(threshold=90.0)
    assert rule.evaluate(PROFILE["id_column"])["passed"] is True
    assert rule.evaluate(PROFILE["value_column"])["passed"] is False


def test_value_range_rule():
    rule = ValueRangeRule(min_value=0, max_value=500)
    assert rule.evaluate(PROFILE["id_column"])["passed"] is True
    r = rule.evaluate(PROFILE["value_column"])
    assert r["passed"] is False and r["actual_max"] == 1000.0
    # applicability: numeric only (dtype-prefix dispatch)
    assert rule.is_applicable({"type": "object", "stats": {}}) is False
    assert rule.is_applicable({"type": "float64", "stats": {}}) is True
    # missing stats → contained failure
    assert ValueRangeRule(0, 1).evaluate({"type": "int64", "stats": {}})["passed"] is False


def test_pattern_match_rule_profile_mode():
    rule = PatternMatchRule(r"^[A-Z]{2}\d{6}$")
    good = {"type": "object", "stats": {"sample_values": ["AB123456", "CD999999"]}}
    bad = {"type": "object", "stats": {"sample_values": ["AB123456", "nope"]}}
    assert rule.evaluate(good)["passed"] is True
    r = rule.evaluate(bad)
    assert r["passed"] is False and r["invalid_count"] == 1
    # invalid regex contained
    assert PatternMatchRule("([").evaluate(good)["passed"] is False
    # re.match anchoring: prefix match passes (not fullmatch)
    pre = PatternMatchRule(r"AB")
    assert pre.evaluate({"type": "object",
                         "stats": {"sample_values": ["ABXYZ"]}})["passed"] is True


def test_engine_evaluate_and_containment():
    class Boom(NullPercentageRule):
        def __init__(self):
            super().__init__()
            self.name = "boom_rule"

        def evaluate(self, _):
            raise RuntimeError("boom")

    engine = RuleEngine()
    for r in default_rules():
        engine.add_rule(r)
    engine.add_rule(Boom())
    results = engine.evaluate_profile(PROFILE)
    assert set(results) == {"id_column", "value_column"}
    id_rules = {r["rule_name"]: r["result"] for r in results["id_column"]}
    assert id_rules["null_percentage_check"]["passed"] is True
    assert id_rules["unique_value_check"]["passed"] is True
    assert id_rules["value_range_check"]["passed"] is True
    boom = [r for r in results["id_column"] if not r["result"]["passed"]]
    assert boom and boom[0]["result"]["reason"] == "Evaluation error"


def test_pattern_rule_full_data(spark):
    """Full-data pattern evaluation: one agg over all rows (our
    deterministic strengthening of the reference's 10-sample check)."""
    df = spark.createDataFrame(
        [("AB123456",), ("XX999999",), ("bad",), (None,), ("",)], ["code"])
    profile = {"code": {"type": "object", "stats": {"sample_values": ["AB123456"]}}}
    engine = RuleEngine()
    engine.add_rule(PatternMatchRule(r"[A-Z]{2}\d{6}$"))
    res = engine.evaluate_profile(profile, df=df)
    verdict = res["code"][0]["result"]
    assert verdict["passed"] is False and verdict["invalid_count"] == 1


def test_pattern_rule_full_data_bad_regex_contained(spark):
    """A Python-valid but Java-invalid regex must not abort the whole
    full-data run: only the offending rule records the error verdict,
    every other rule still gets its true full-data count."""
    df = spark.createDataFrame(
        [("AB123456",), ("bad",), ("XX999999",)], ["code"])
    profile = {"code": {"type": "object",
                        "stats": {"sample_values": ["AB123456"]}}}
    engine = RuleEngine()
    engine.add_rule(PatternMatchRule(r"[A-Z]{2}\d{6}$", name="good_rule"))
    # (?P<x>...) is Python's named-group syntax; Java regex rejects it
    engine.add_rule(PatternMatchRule(r"(?P<x>[a-z]\d)", name="bad_rule"))
    res = engine.evaluate_profile(profile, df=df)
    by_name = {r["rule_name"]: r["result"] for r in res["code"]}
    assert by_name["good_rule"]["passed"] is False
    assert by_name["good_rule"]["invalid_count"] == 1
    assert by_name["bad_rule"]["passed"] is False
    assert by_name["bad_rule"]["reason"] == "Evaluation error"


def test_config_loader(tmp_path):
    yaml_text = """
rules:
  - type: null_percentage
    threshold: 1.0
  - type: unique_value
    threshold: 95.0
  - type: value_range
    min_value: 0
    max_value: 1000
  - type: pattern_match
    pattern: "^\\\\d{3}-\\\\d{3}-\\\\d{4}$"
    name: us_phone_format_check
  - type: nonsense_rule
  - type: pattern_match
"""
    p = tmp_path / "rules.yaml"
    p.write_text(yaml_text)
    rules = load_rules_from_file(str(p))
    assert len(rules) == 4  # unknown type + patternless entry skipped
    assert rules[0].threshold == 1.0
    assert rules[3].name == "us_phone_format_check"

    jp = tmp_path / "rules.json"
    jp.write_text(json.dumps({"rules": [{"type": "unique_value", "threshold": 99}]}))
    jrules = load_rules_from_file(str(jp))
    assert len(jrules) == 1 and jrules[0].threshold == 99

    with pytest.raises(FileNotFoundError):
        load_rules_from_file(str(tmp_path / "missing.yaml"))
    bad = tmp_path / "bad.yaml"
    bad.write_text("not_rules: []")
    with pytest.raises(ValueError):
        load_rules_from_file(str(bad))
    assert create_rule_from_config({"threshold": 5}) is None


def test_summary_and_health():
    s = calculate_summary(PROFILE)
    assert s["dataset_statistics"]["total_columns"] == 2
    assert s["dataset_statistics"]["avg_null_percentage"] == 5.0
    assert s["data_quality_indicators"]["completeness"] == 95.0
    assert s["notable_columns"]["highest_null_column"]["name"] == "value_column"
    assert s["notable_columns"]["lowest_unique_column"]["name"] == "value_column"
    assert calculate_summary({}) == {}

    engine = RuleEngine()
    for r in default_rules():
        engine.add_rule(r)
    results = engine.evaluate_profile(PROFILE)
    h = get_health_score(results, PROFILE)
    # id passes 3/3; value fails null+unique, passes range → 4/6
    assert h["components"]["rule_compliance"] == round(4 / 6 * 100, 2)
    assert h["health_score"] == round(h["components"]["rule_compliance"] * 0.7
                                      + 95.0 * 0.3, 2)
    assert h["health_status"] in {"Excellent", "Good", "Fair", "Poor"}
    assert h["column_scores"]["id_column"] == 100.0


def test_insights_thresholds():
    profile = {
        "outlier_col": {"type": "float64",
                        "stats": {"count": 1000, "mean": 0.0, "std_dev": 1.0,
                                  "min": -2.0, "max": 10.0, "median": 0.0,
                                  "null_percentage": 0.0, "unique_percentage": 50.0}},
        "skewed_col": {"type": "int64",
                       "stats": {"count": 1000, "mean": 200.0, "median": 100.0,
                                 "std_dev": 10.0, "min": 195, "max": 205,
                                 "null_percentage": 15.0, "unique_percentage": 0.5}},
    }
    out = detect_outliers(profile)
    assert "outlier_col" in out
    assert out["outlier_col"][0]["type"] == "maximum"
    assert out["outlier_col"][0]["z_score"] == 10.0
    skew = detect_distribution_skewness(profile)
    assert skew["skewed_col"]["direction"] == "right-skewed"
    assert skew["skewed_col"]["strength"] == "strong"
    ins = get_data_insights(profile)
    assert "skewed_col" in ins["data_quality_issues"]["high_null_columns"]
    assert "skewed_col" in ins["data_quality_issues"]["low_unique_columns"]
    assert ins["summary"] and ins["recommendations"]


def test_text_report():
    engine = RuleEngine()
    for r in default_rules():
        engine.add_rule(r)
    results = engine.evaluate_profile(PROFILE)
    report = generate_text_report("s3://bucket/test_data.parquet", PROFILE, results)
    assert "= DataCanary Quality Report =" in report
    assert "Dataset: s3://bucket/test_data.parquet" in report
    assert "== Column: id_column [✓] ==" in report
    assert "== Column: value_column [✗] ==" in report
    assert "Overall status: FAILED" in report
    assert "null_percentage_check" in report
