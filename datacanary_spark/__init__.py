"""datacanary_spark — a PySpark-native web-text quality-filter engine.

A from-scratch rebuild of the capabilities of the reference toolkit
``d4min/datacanary`` (a single-node pandas data-quality checker, see
/root/reference), re-expressed Spark-first:

* per-column statistical profiling as ONE single-pass ``df.agg(...)``
  (reference: ``src/datacanary/analysers/statistical_analyser.py:17-98``,
  eager multi-pass pandas),
* a configurable rule engine producing verdicts
  (reference: ``src/datacanary/rules/rule_engine.py:318-402``),
* dataset summary / health score / insights
  (reference: ``src/datacanary/analysis/summary_statistics.py``,
  ``trend_detection.py``),
* and — the generalization this engine exists for — a row-level
  web-text quality-filter pipeline (language-ID, n-gram perplexity,
  Gopher/C4-style heuristics, PII/toxicity scrubbing) designed for
  10^12-document scale: vectorized pandas/Arrow UDFs with broadcast
  models, pure Column expressions in the hot path, explicit url-hash
  repartitioning, salted aggregation for skewed hosts, AQE, and
  per-partition lineage + checkpoint/resume.

No code is copied from the reference; semantics are reimplemented from
its observable behavior (file:line citations in docstrings).
"""

__version__ = "0.1.0"
