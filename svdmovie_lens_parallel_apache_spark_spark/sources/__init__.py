from .readers import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    read_movielens_ratings,
    read_tsv,
)
from .writers import write_parquet, write_tsv  # noqa: F401
