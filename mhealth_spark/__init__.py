"""mhealth_spark — a from-scratch, PySpark-native feature-engineering engine.

Re-expresses the query semantics of ``akre96/mHealth-feature-generation``
(reference read-only at ``/root/reference``) as an idiomatic Spark engine:

- point-in-time / as-of joins with temporal-leakage guards (``asof``)
- interval algebra & gap-based sessionization (``intervals``)
- tumbling buckets incl. per-entity dynamic origins (``buckets``)
- bias-corrected statistical aggregates + closed-form OLS (``aggregates``)
- numpy-only cosinor / Lomb-Scargle Arrow kernels (``kernels``)
- sleep-session features (``sleep``), QC masks (``qc``)
- pipeline assembly (``features``), checkpoint/resume (``checkpoint``)
- large-scale training-data ops (``pipelines``: dedup, similarity, text,
  multimodal)

Everything is built on the public DataFrame API: Catalyst/AQE pick the
physical plan; Python appears only inside Arrow-vectorized
``applyInPandas`` / ``mapInPandas`` kernels (never per-row UDFs).
"""

__version__ = "0.1.0"

from mhealth_spark.session import get_spark  # noqa: F401
