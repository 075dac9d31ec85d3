from webcrawler_spark.functions import urltools, htmltools, robots  # noqa: F401
