"""Config-key mapping: DataFusion setting names -> Spark SQL conf.

The reference forwards ``ctx.set(key, value)`` verbatim into DataFusion's
config (``/root/reference/src/context.rs:115-123``,
``/root/reference/datafusion_ray/core.py:657-658``). The keys its own
benchmark harness actually uses (``/root/reference/tpch/tpcbench.py:70-73``)
are mapped onto their Spark equivalents here; unknown keys are retained
verbatim so callers can also set native ``spark.*`` keys through the same
facade.
"""

from __future__ import annotations

#: datafusion.* key -> spark key. ``None`` means "accepted but meaningless on
#: Spark" (the engine logs and drops it).
KEY_MAP: dict[str, str | None] = {
    "datafusion.execution.target_partitions": "spark.sql.shuffle.partitions",
    "datafusion.execution.batch_size": "spark.sql.execution.arrow.maxRecordsPerBatch",
    "datafusion.execution.parquet.pushdown_filters": "spark.sql.parquet.filterPushdown",
    "datafusion.execution.parquet.reorder_filters": None,
    "datafusion.execution.coalesce_batches": None,
    "datafusion.optimizer.enable_round_robin_repartition": None,
}


def translate(key: str) -> str | None:
    """Return the Spark conf key for a DataFusion key.

    Native spark keys pass through; unknown datafusion keys map to None.
    """
    if key in KEY_MAP:
        return KEY_MAP[key]
    if key.startswith("datafusion."):
        return None
    return key
