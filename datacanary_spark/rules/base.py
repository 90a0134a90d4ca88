"""Rule base class.

Reimplements the reference's ``Rule`` contract
(/root/reference/src/datacanary/rules/rule_engine.py:10-62): a rule has
``name`` / ``description`` / ``applicable_types`` and evaluates against
one column's profile entry ``{"type": str, "stats": {...}}`` returning a
verdict dict with at least ``passed: bool``.

Applicability is a string-PREFIX match on the dtype name (reference
:45-47) — e.g. ``["int", "float", "numeric"]`` matches "int64"/"float64".
``applicable_types=None`` means all types. We return an explicit bool
(the reference falls off the end and returns None on no-match, :37-47 —
behaviorally identical, we just don't replicate the falsy quirk).
"""

from __future__ import annotations

from typing import Any


class Rule:
    def __init__(self, name: str, description: str,
                 applicable_types: list[str] | None):
        self.name = name
        self.description = description
        self.applicable_types = applicable_types

    def is_applicable(self, column_profile: dict[str, Any]) -> bool:
        if self.applicable_types is None:
            return True
        col_type = column_profile.get("type")
        if col_type is None:
            return False
        return any(col_type.startswith(t) for t in self.applicable_types
                   if isinstance(t, str))

    def evaluate(self, column_profile: dict[str, Any]) -> dict[str, Any]:
        raise NotImplementedError("Subclasses must implement this method")

    @staticmethod
    def _missing(*stat_names: str) -> dict[str, Any]:
        """Reference behavior for unavailable stats: fail with a reason
        (rule_engine.py:93-99 etc.)."""
        return {
            "passed": False,
            "reason": "Required statistics not available",
            "details": f"Missing {' or '.join(repr(s) for s in stat_names)} "
                       f"statistic{'s' if len(stat_names) > 1 else ''}",
        }
