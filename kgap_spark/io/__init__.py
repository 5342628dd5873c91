from kgap_spark.io.rdf import read_ntriples, write_ntriples, export_results  # noqa: F401
