from bright_spark.sources.formats import UnsupportedFormatError, read_documents

__all__ = ["read_documents", "UnsupportedFormatError"]
