"""spark-clip-quality: a from-scratch PySpark-native quality-filter engine.

A language-ID + quality-filter + PII/toxicity-scrub DAG over a table of
audio clip + transcript pairs, re-expressing the cleaning semantics of
YaxuanSeanZhang/GPS-Data-Quality (reference at /root/reference, R scripts)
as a single fused Spark DataFrame pass.  See SURVEY.md for the full
operator-by-operator mapping.
"""

__version__ = "0.1.0"
