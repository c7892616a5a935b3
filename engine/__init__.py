"""spark-clip-quality: a from-scratch PySpark-native quality-filter engine.

A language-ID + quality-filter + PII/toxicity-scrub DAG over a table of
audio clip + transcript pairs, re-expressing the cleaning semantics of
YaxuanSeanZhang/GPS-Data-Quality (reference at /root/reference, R scripts)
as a single fused Spark DataFrame pass.  See SURVEY.md for the full
operator-by-operator mapping.
"""

__version__ = "0.1.0"

# Pin BLAS/OpenMP pools to one thread per process wherever the engine is
# imported BEFORE numpy first loads its BLAS (executor python workers
# that unpickle a UDF referencing engine.*, jobs, tests).  Parallelism
# belongs to Spark's task scheduler here, not to nested numpy pools: with
# K concurrent UDF workers an unpinned pool oversubscribes the box
# K*ncpus-fold, and even one worker pays the pool wake cost on every
# small per-clip BLAS call.  setdefault — an operator who wants nested
# BLAS threading can still export the vars explicitly.  (The per-clip hot
# path is additionally BLAS-free by construction: audio_core uses einsum
# for its reductions, so this pin is belt-and-braces for the embedding /
# refit matmul paths.)
import os as _os

for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
             "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    _os.environ.setdefault(_var, "1")
