"""Source formats — SURVEY.md §2.1 S1-S3.

Reference behavior:
- S1 jsoneachrow (`formats/jsoneachrow.go:17-45`): one JSON object per
  line, empty/whitespace-only lines skipped, malformed line -> error
  naming the line number.
- S2 msgpack (`formats/msgpack.go:12-24`): one msgpack-encoded array of
  maps.
- S3 dispatch (`formats/format.go:15-24`): format name -> parser,
  unknown -> ErrUnsupportedFormat; `jsoneachrow` is the default
  (`handlers/documents.go:69`).

Spark-native mapping: jsoneachrow IS Spark's native json source (JSONL;
Spark already skips blank lines and parallelizes the scan — at 100 TB
the file listing + splits come from the data source framework, nothing
driver-side). Malformed-line behavior is pinned to the reference with
``mode=FAILFAST`` (default here) or surfaced per-row via PERMISSIVE +
``_corrupt_record``. msgpack has no JVM data source in this sandbox:
decode runs as ``binaryFile`` rows -> ``mapInPandas``, using the
C-accelerated ``msgpack`` package when installed and the bundled
pure-spec codec (sources/msgpack_lite.py) otherwise — S2 runs
end-to-end either way (schema inference on a driver sample, Arrow
batches, partition parallelism).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("jsoneachrow", "msgpack", "parquet")
DEFAULT_FORMAT = "jsoneachrow"  # handlers/documents.go:69


class UnsupportedFormatError(ValueError):
    """format/format.go:13 ErrUnsupportedFormat analog."""


def read_documents(spark: SparkSession, path: str,
                   fmt: str = DEFAULT_FORMAT,
                   schema: str | None = None) -> DataFrame:
    """Schemaless document ingestion (docs are `map[string]any` in the
    reference; Spark infers a struct schema unless one is given)."""
    if fmt == "jsoneachrow":
        reader = spark.read
        if schema:
            reader = reader.schema(schema)
        # FAILFAST: malformed JSON raises, like the reference's
        # per-line error (jsoneachrow.go:33-35); Spark skips blank
        # lines natively (:28-30)
        return reader.option("mode", "FAILFAST").json(path)
    if fmt == "msgpack":
        return _read_msgpack(spark, path, schema)
    if fmt == "parquet":
        return spark.read.parquet(path)
    raise UnsupportedFormatError(f"unsupported format: {fmt!r}")


def _decode_msgpack_blobs(blobs: list[bytes]) -> list[dict]:
    """One blob = one msgpack array of maps (formats/msgpack.go:12-24).
    Uses the C-accelerated ``msgpack`` package when installed, else the
    bundled pure-spec decoder (sources/msgpack_lite.py)."""
    try:
        from msgpack import unpackb as _unpackb
        kwargs = {"raw": False}
    except ImportError:
        from bright_spark.sources.msgpack_lite import unpackb as _unpackb
        kwargs = {}
    docs: list[dict] = []
    for blob in blobs:
        decoded = _unpackb(blob, **kwargs)
        if not isinstance(decoded, list):
            raise ValueError("msgpack document batch must be an array of "
                             "maps (formats/msgpack.go:18-22)")
        docs.extend(decoded)
    return docs


def _read_msgpack(spark: SparkSession, path: str,
                  schema: str | None) -> DataFrame:
    """binaryFile scan -> Arrow-batch decode. Schema must be supplied
    (or inferrable from a driver-side sample of the first file)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")
    if schema is None:
        sample = files.limit(1).collect()
        if not sample:
            raise ValueError(f"no msgpack files under {path}")
        docs = _decode_msgpack_blobs([bytes(sample[0]["content"])])
        probe = spark.createDataFrame([json.loads(json.dumps(d)) for d in docs[:100]])
        schema = probe.schema.simpleString()[7:-1]  # strip struct<...>

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs = _decode_msgpack_blobs([bytes(b) for b in pdf["content"]])
            if docs:
                yield pd.DataFrame(docs)

    return files.mapInPandas(decode, schema)
