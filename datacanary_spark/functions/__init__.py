"""Functions: Column-expression heuristics (JVM hot path) + pandas/Arrow
UDF models (langid, perplexity, scrub — the only Python in the pipeline)."""
