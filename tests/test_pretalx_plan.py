"""Pipeline e2e: schedule doc + target state -> golden reconcile plan
(SURVEY.md §5.2.3)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pretalx_hub_etl_spark.plans.pretalx import full_pipeline, transform_talks
from pretalx_hub_etl_spark.sources import fixture_schedule, normalize_schedule
from pretalx_hub_etl_spark.sources.json_doc import schedule_df


def _target(spark):
    # FIXTURES.md §B2: update (matched), delete (unmatched), and the
    # empty-tags row the reference crashes on (main.py:137)
    return spark.createDataFrame(
        [
            ("ev-1", "Opening Keynote", ["talk-a"]),   # matches TALK-A (case-insensitive)
            ("ev-2", "Old Event", ["gone-talk"]),      # -> delete
            ("ev-3", "Broken Row", []),                # empty tags: quarantined, then delete-less
        ],
        "id string, name string, tags array<string>",
    )


def test_transform_projection_semantics(spark):
    doc = schedule_df(spark, fixture_schedule())
    speakers, talks = normalize_schedule(doc)
    events = transform_talks(talks, speakers)
    collected = events.collect()
    assert len(collected) == 5  # incl. BOTH duplicate-code talks
    rows = {r.name: r for r in collected}
    rows["TALK-A"] = rows["Opening Keynote"]
    rows["TALK-B"] = rows[""]  # null title -> "" via falsy-coalesce
    rows["TALK-A"].tags  # noqa: B018 - sanity the alias exists
    # falsy-coalesce: null title -> "" (rows["TALK-B"] keyed via that "")
    assert rows["TALK-B"].tags == "TALK-B"
    # literal columns
    assert rows["TALK-A"].location == "CDC" and rows["TALK-A"].language == "en"
    # room lookup
    assert rows["TALK-A"].room == "CDC Triangle"
    # plural formatting: 1 speaker vs several
    assert rows["TALK-A"].description_en == "Speaker: Speaker Number 0"
    assert rows["TALK-B"].description_en.startswith("Speakers: ")
    # tz-aware parse (+0100 spelling)
    assert rows["TALK-B"].schedule_start is not None


def test_full_pipeline_golden_plan(spark):
    doc = schedule_df(spark, fixture_schedule())
    plan = full_pipeline(doc, _target(spark))
    flags = {}
    for r in plan.collect():
        flags.setdefault(r.op_flag, set()).add(r.match_key)

    # talk-a matched ev-1 and the name matches -> update-or-noop branch;
    # name "Opening Keynote" == source name -> noop
    assert "talk-a" in flags.get("noop", set()) | flags.get("update", set())
    # unmatched source talks -> create (talk-b, empty-code, talk-c)
    assert "talk-b" in flags["create"]
    # target-only tag -> delete
    assert "gone-talk" in flags["delete"]
    # duplicate source code TALK-A collapses to one key; total coverage:
    src_keys = {"talk-a", "talk-b", "", "talk-c"}
    covered = set().union(*flags.values())
    assert src_keys <= covered


def test_bootstrap_assembly_id(spark):
    from pretalx_hub_etl_spark.plans.pretalx import (
        AssemblyNotFound,
        bootstrap_assembly_id,
    )

    assemblies = spark.createDataFrame(
        [("a-1", "congress"), ("a-2", "camp"), ("", "ghost")],
        "id string, slug string",
    )
    assert bootstrap_assembly_id(assemblies, "camp") == "a-2"
    # empty result -> clean error, not IndexError (reference main.py:41)
    with pytest.raises(AssemblyNotFound, match="nope"):
        bootstrap_assembly_id(assemblies, "nope")
    # falsy id -> same error (reference main.py:43-48)
    with pytest.raises(AssemblyNotFound, match="ghost"):
        bootstrap_assembly_id(assemblies, "ghost")


def test_load_plan_rate_limited_end_to_end(spark, tmp_path):
    """Full reference pipeline THROUGH the throttled Load phase: the
    reconcile plan's create/update rows reach the mock writer paced by
    the per-partition token bucket (the engine twin of main.py:232's
    sleep-throttled submit loop). Floor is generous: 3 submitted rows in
    one partition at 20 rows/s = 2 paced intervals >= 0.09 s."""
    import time

    from pretalx_hub_etl_spark.plans.pretalx import load_plan
    from pretalx_hub_etl_spark.sources.json_doc import schedule_df

    doc = schedule_df(spark, fixture_schedule())
    plan = full_pipeline(doc, _target(spark)).coalesce(1)
    n_submit = plan.filter(F.col("op_flag").isin("create", "update")).count()
    assert n_submit >= 3  # fixture guarantees work for the sink

    log = str(tmp_path / "submitted.log")

    def factory():
        f = open(log, "a")
        return (lambda row: f.write(row["match_key"] + "\n")), f.close

    t0 = time.monotonic()
    load_plan(plan, factory, rate_limit_rows_per_sec=20.0)
    elapsed = time.monotonic() - t0

    with open(log) as f:
        submitted = f.read().splitlines()  # keys may be empty strings
    assert len(submitted) == n_submit           # every create/update, once
    assert elapsed >= (n_submit - 1) * 0.045    # >= requested pacing
    # deletes/noops never reach the effectful writer
    deletes = {r.match_key for r in plan.filter("op_flag = 'delete'").collect()}
    assert deletes and not deletes & set(submitted)
