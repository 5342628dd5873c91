from kgap_spark.io.rdf import (  # noqa: F401
    export_results,
    ntriples_rejects,
    read_ntriples,
    read_rdf,
    write_ntriples,
    write_turtle,
)
