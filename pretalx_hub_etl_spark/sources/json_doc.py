"""JSON document source: nested schedule doc -> normalized DataFrames (S1).

The reference fetches one nested schedule JSON (main.py:96-97) with two
top-level arrays (``speakers``, ``talks``) and loops over them row-wise.
Spark-first: declare an explicit StructType for the document (FIXTURES.md
§B1 — inference would be an extra full scan at size) and ``explode`` each
array into a proper DataFrame.

At scale the same schema feeds ``spark.read.schema(...).json(path)`` over a
directory of documents; ``normalize_schedule`` works on any DataFrame of
parsed documents, one row per doc.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEDULE_SCHEMA = T.StructType(
    [
        T.StructField(
            "speakers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("code", T.StringType()),
                        T.StructField("name", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "talks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("title", T.StringType()),
                        T.StructField("room", T.IntegerType()),
                        T.StructField("abstract", T.StringType()),
                        T.StructField("speakers", T.ArrayType(T.StringType())),
                        T.StructField("start", T.StringType()),
                        T.StructField("duration", T.StringType()),
                        T.StructField("code", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def read_schedule_json(spark: SparkSession, path: str) -> DataFrame:
    """Read schedule document(s) with the fixed schema (no inference scan)."""
    return spark.read.schema(SCHEDULE_SCHEMA).json(path, multiLine=True)


def schedule_df(spark: SparkSession, doc: dict) -> DataFrame:
    """Lift one already-fetched document (the reference's case) into a DF."""
    return spark.read.schema(SCHEDULE_SCHEMA).json(
        spark.sparkContext.parallelize([json.dumps(doc)])
    )


def normalize_schedule(doc_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Explode a document DataFrame into (speakers, talks) DataFrames.

    speakers: (code, name); talks: the B1 talk fields, one row per talk.
    """
    speakers = doc_df.select(F.explode("speakers").alias("s")).select(
        F.col("s.code").alias("code"), F.col("s.name").alias("name")
    )
    talks = doc_df.select(F.explode("talks").alias("t")).select("t.*")
    return speakers, talks


def fixture_schedule() -> dict:
    """Deterministic reference-shaped schedule doc (FIXTURES.md §B1/§B4).

    Includes the surveyed edge cases: null/empty title-abstract-code, both
    tz-offset spellings, 1-speaker and multi-speaker talks, duplicate codes.
    """
    speakers = [{"code": f"SPK{i}", "name": f"Speaker Number {i}"} for i in range(8)]
    talks = [
        {
            "title": "Opening Keynote",
            "room": 1,
            "abstract": "welcome talk",
            "speakers": ["SPK0"],
            "start": "2026-08-01T10:00:00+01:00",
            "duration": "00:30",
            "code": "TALK-A",
        },
        {
            "title": None,  # falsy-coalesce edge (main.py:116)
            "room": 2,
            "abstract": "",
            "speakers": ["SPK1", "SPK2"],
            "start": "2026-08-01T11:00:00+0100",  # %z without colon (main.py:128)
            "duration": "01:00",
            "code": "TALK-B",
        },
        {
            "title": "Workshop",
            "room": 3,
            "abstract": None,
            "speakers": ["SPK3", "SPK4", "SPK5"],
            "start": "2026-08-01T12:15:00+02:00",
            "duration": "00:45",
            "code": "",  # empty join key
        },
        {
            "title": "Duplicate Code Talk",
            "room": 1,
            "abstract": "dup",
            "speakers": ["SPK6"],
            "start": "2026-08-01T13:00:00+02:00",
            "duration": "00:30",
            "code": "TALK-A",  # duplicate code (first-match edge)
        },
        {
            "title": "Closing",
            "room": 2,
            "abstract": "bye",
            "speakers": ["SPK7"],
            "start": "2026-08-02T09:30:00+00:00",
            "duration": "00:15",
            "code": "talk-c",  # case-normalization edge
        },
    ]
    return {"speakers": speakers, "talks": talks}
