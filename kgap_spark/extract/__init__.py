from kgap_spark.extract.html_text import extract_text, extract_text_udf, with_extracted_text  # noqa: F401
