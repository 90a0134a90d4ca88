"""Dataset-level rollups: summary, health score, insights (§2.5 ports)."""
