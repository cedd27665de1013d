from evolution_spark.io.bucketed import read_table, write_bucketed
from evolution_spark.io.clustered import write_range_clustered, write_zorder_clustered
from evolution_spark.io.compact import compact_parquet, expire_partitions
from evolution_spark.io.flf import (
    encode_flf,
    parse_flf,
    read_flf,
    write_flf,
)
from evolution_spark.io.ipc import write_ipc
from evolution_spark.io.ivf_layout import read_ivf_cells, write_ivf_partitioned
from evolution_spark.io.partitioned import overwrite_partitions, write_partitioned

__all__ = [
    "write_ivf_partitioned",
    "read_ivf_cells",
    "write_partitioned",
    "overwrite_partitions",
    "read_flf",
    "parse_flf",
    "encode_flf",
    "write_flf",
    "write_ipc",
    "write_bucketed",
    "compact_parquet",
    "expire_partitions",
    "write_range_clustered",
    "write_zorder_clustered",
    "read_table",
]
