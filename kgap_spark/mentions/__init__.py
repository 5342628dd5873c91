from kgap_spark.mentions.detect import detect_mentions, with_ngrams  # noqa: F401
