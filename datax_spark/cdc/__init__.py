"""CDC layer: deterministic change-event generation, batch apply, and the
Structured Streaming pipeline (tail → LWW dedup → MERGE → fence → lineage).
"""

from datax_spark.cdc.apply import apply_changes  # noqa: F401
from datax_spark.cdc.generator import changes_df, pages_df  # noqa: F401
