"""Sources: deterministic fixture generation + table-format-agnostic IO."""
