"""Round-4 query registrations.

Same contract as queries_r2/r3: every @register pairs a Spark DataFrame plan
with a DuckDB ANSI-SQL oracle twin over the driver's parquet tables, column
names/types aligned on both sides. Imported from queries_r3's tail so the
chain entry_queries -> queries_r2 -> queries_r3 -> queries_r4 stays
cycle-safe; R4_NAMES feeds the round-4 driver window AFTER the recertify
head and the never-checked rotation slice (see
entry_queries.ordered_registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from cliner_spark.entry_queries import (  # noqa: F401
    REGISTRY,
    load,
    load_docs,
    register,
)

# Names registered by this module, in driver-verification priority order.
R4_NAMES: list[str] = []


def _register_r4(name: str, sql: str | None):
    """@register that also appends to R4_NAMES (driver-window priority)."""

    def deco(fn):
        R4_NAMES.append(name)
        return register(name, sql)(fn)

    return deco
