"""File-format sources/sinks beyond parquet (SURVEY.md §2.2: the
reference has NO file formats — only Postgres in, gRPC/STOMP out; an
engine needs them, and Spark provides them natively).

Explicit schemas everywhere: schema inference is an extra full pass of
the data — a non-starter at 100 TB and a correctness hazard (sampled
inference can mistype sparse columns). CSV/JSON carry no types, so the
event schema is declared once here and reused by every reader.

ORC and Parquet are the columnar paths (predicate pushdown + column
pruning work); CSV/JSON are interchange formats — read them once,
land them columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events with ts as a real timestamp (what changelog_from_events expects
# after the nanos conversion parquet needs; CSV/JSON serialize real
# timestamps directly)
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def read_events_csv(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema(EVENTS_SCHEMA)
        .option("header", "true")
        .option("timestampFormat", TS_FMT)
        .csv(path)
    )


def read_events_json(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema(EVENTS_SCHEMA)
        .option("timestampFormat", TS_FMT)
        .json(path)
    )


def read_events_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_events(df: DataFrame, path: str, fmt: str) -> None:
    """Land a frame in the given format. CSV needs an explicit timestamp
    format (default rendering drops sub-second precision)."""
    writer = df.write.mode("overwrite")
    if fmt in ("csv", "json"):
        # default timestamp rendering is millisecond-precision — lossy
        writer = writer.option("timestampFormat", TS_FMT)
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path)


def partitioned_parquet_writer(
    df: DataFrame, path: str, by: str = "event_type"
) -> None:
    """The 100 TB landing layout: hive-partitioned parquet so downstream
    scans partition-prune. Local stand-in for date/table partitioning of
    the production changelog."""
    df.write.mode("overwrite").partitionBy(by).parquet(path)
