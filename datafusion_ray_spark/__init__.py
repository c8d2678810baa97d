"""PySpark-native analytics engine with apache/datafusion-ray capability parity.

Public surface:
- :class:`datafusion_ray_spark.context.DFRayContext` — session facade
  (register_parquet/csv/listing, sql, set), mirroring the reference's
  ``DFRayContext`` (``/root/reference/datafusion_ray/core.py:558-663``).
- :mod:`datafusion_ray_spark.queries` — the oracle-checked query suite.
- :mod:`datafusion_ray_spark.operators` — LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal) beyond reference
  parity.
"""

from .context import DFRayContext, DFRayDataFrame
from .session import build_session

__all__ = ["DFRayContext", "DFRayDataFrame", "build_session"]
