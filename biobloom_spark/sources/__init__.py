from .tables import (
    LINEAGE_SCHEMA,
    PARTIAL_SCHEMA,
    REGISTRY_SCHEMA,
    TABLE_NAMES,
    docs_with_frames,
    load_table,
    register_views,
    write_table,
)

__all__ = [
    "LINEAGE_SCHEMA",
    "PARTIAL_SCHEMA",
    "REGISTRY_SCHEMA",
    "TABLE_NAMES",
    "docs_with_frames",
    "load_table",
    "register_views",
    "write_table",
]
