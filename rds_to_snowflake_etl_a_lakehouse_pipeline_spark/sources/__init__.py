"""IO layer: sources (parquet/csv/jdbc) and sinks (parquet table,
warehouse) behind one interface."""

from .io import (  # noqa: F401
    WarehouseSink,
    connection_config,
    read_csv,
    read_jdbc,
    read_parquet,
    snowflake_options,
    write_table,
)
from .layout import (  # noqa: F401
    bloom_filtered_write,
    pruning_stats,
    zorder_by,
    zorder_write,
)
from .versioned import CommitConflictError, VersionedTable  # noqa: F401
