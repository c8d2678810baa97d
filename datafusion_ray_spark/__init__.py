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
from .validator import prettify


def setup_logging() -> None:
    """Migration-compat twin of the reference's module-level logging setup
    (``/root/reference/datafusion_ray/core.py:37-49``): honors the same
    ``DATAFUSION_RAY_LOG_LEVEL`` env var, applied to this package's
    loggers (Spark's own log level is configured via log4j)."""
    import logging
    import os

    logging.addLevelName(5, "TRACE")
    level = os.environ.get("DATAFUSION_RAY_LOG_LEVEL", "WARN").upper()
    logging.getLogger("datafusion_ray_spark").setLevel(level)
    logging.basicConfig()


#: Migration-compat for ``from datafusion_ray import df_ray_runtime_env``
#: (reference ``core.py:53-61``): the reference ships this dict to Ray
#: workers; Spark executors inherit the session's conf/env instead, so an
#: empty runtime env is the correct equivalent — scripts pass it through
#: unchanged and nothing needs it on Spark.
df_ray_runtime_env: dict = {"env_vars": {}}

__all__ = [
    "DFRayContext",
    "DFRayDataFrame",
    "build_session",
    "df_ray_runtime_env",
    "prettify",
    "setup_logging",
]
