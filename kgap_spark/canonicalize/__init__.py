from kgap_spark.canonicalize.connected_components import (  # noqa: F401
    connected_components,
    duplicate_edges,
    canonical_mapping,
)
