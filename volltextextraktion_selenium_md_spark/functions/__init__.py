from volltextextraktion_selenium_md_spark.functions import classify, mime, text, urls  # noqa: F401
