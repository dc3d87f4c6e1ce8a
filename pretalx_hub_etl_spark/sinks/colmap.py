"""Column mapping for metadata-only RENAME / DROP / widen COLUMN (S46, S52).

The Delta column-mapping idea (logical names decoupled from the
physical names inside data files), transposed to this engine's
table-props metadata: every rename/drop is an EVENT
``{"op": "rename", "old", "new", "since"}`` /
``{"op": "drop", "name", "since"}`` appended to the table's
``column_events`` property, anchored at a metadata-only commit
(``merge.commit_metadata_version`` — same file set as the base, so the
version history records when the schema changed without rewriting a
byte of data).

Read side: events with ``since <= read version`` are applied IN ORDER
to the physical scan —

- rename, both names present (mixed files under mergeSchema: files
  written before the rename carry ``old``, files after carry ``new``):
  ``coalesce(new, old) AS new`` then drop ``old``. Each physical row
  comes from exactly one file and carries exactly one of the two, so
  the coalesce is exact (a genuine NULL in a new file falls through to
  the old column's NULL).
- rename, only ``old`` present (no post-rename file yet): plain rename.
- drop: project the column out if present.

Time travel: a read AS OF a version BELOW an event's ``since`` never
applies it — old snapshots serve their original column names, the
verdict's contract.

Write side needs NO translation: writers write the CURRENT logical
names (post-rename files physically carry the new name), which is what
keeps this metadata-only. The append schema-compare in the DataSource
writer admits prior physical names as declared residents of mixed
versions.

No reference counterpart (the reference has no schema layer); the
event/overlay shape follows the public Delta column-mapping design
discussions.
"""

from __future__ import annotations

from typing import Any


def column_events(props: dict[str, Any]) -> list[dict[str, Any]]:
    return list(props.get("column_events") or [])


def events_upto(
    props: dict[str, Any], version: int | None
) -> list[dict[str, Any]]:
    """The events a read at ``version`` applies (None = current read =
    all events; a rename's ``since`` is always a published version, so
    every event applies to the current head)."""
    evs = column_events(props)
    if version is None:
        return evs
    return [e for e in evs if int(e.get("since", 0)) <= version]


def apply_events_df(df, events: list[dict[str, Any]]):
    """Overlay the events on a physical scan frame, in order."""
    from pyspark.sql import functions as F

    for e in events:
        have = {c.lower(): c for c in df.columns}
        if e["op"] == "rename":
            o = have.get(e["old"].lower())
            n = have.get(e["new"].lower())
            if o is not None and n is not None:
                df = df.withColumn(
                    n, F.coalesce(F.col(n), F.col(o))
                ).drop(o)
                if n != e["new"]:
                    df = df.withColumnRenamed(n, e["new"])
            elif o is not None:
                df = df.withColumnRenamed(o, e["new"])
            # neither present (fully compacted post-rename): no-op
        elif e["op"] == "widen":
            # S52 type widening (ALTER COLUMN c TYPE BIGINT): old files
            # keep their narrow physical type forever; the overlay
            # casts on read (metadata-only — the Delta INT->BIGINT
            # widening shape). Post-widen files physically carry the
            # wide type, for which the cast is a no-op.
            c = have.get(e["name"].lower())
            if c is not None:
                df = df.withColumn(c, F.col(c).cast(e["to"]))
        else:  # drop
            c = have.get(e["name"].lower())
            if c is not None:
                df = df.drop(c)
    return df


def apply_events_schema(schema, events: list[dict[str, Any]]):
    """The :func:`apply_events_df` transform on a StructType (for
    driver-side schema resolution)."""
    from pyspark.sql.types import StructField, StructType

    fields = list(schema.fields)
    for e in events:
        lower = {f.name.lower(): i for i, f in enumerate(fields)}
        if e["op"] == "rename":
            oi = lower.get(e["old"].lower())
            ni = lower.get(e["new"].lower())
            if oi is not None and ni is not None:
                del fields[oi]
            elif oi is not None:
                f = fields[oi]
                fields[oi] = StructField(
                    e["new"], f.dataType, f.nullable, f.metadata
                )
        elif e["op"] == "widen":
            i = lower.get(e["name"].lower())
            if i is not None:
                from pyspark.sql.types import _parse_datatype_string

                f = fields[i]
                fields[i] = StructField(
                    f.name,
                    _parse_datatype_string(e["to"]),
                    f.nullable,
                    f.metadata,
                )
        else:
            i = lower.get(e["name"].lower())
            if i is not None:
                del fields[i]
    return StructType(fields)


def prior_physical_names(
    props: dict[str, Any], logical: str
) -> list[str]:
    """Every earlier physical name of the CURRENT logical column
    ``logical`` (the rename chain walked backward) — lets stats pruning
    on a renamed column also prune files written under its old names
    (sound either way: a file without stats for a name is never
    skipped)."""
    names = [logical]
    for e in reversed(column_events(props)):
        if (
            e["op"] == "rename"
            and e["new"].lower() == names[-1].lower()
        ):
            names.append(e["old"])
    return names[1:]


def retired_names(props: dict[str, Any]) -> set[str]:
    """Lowercased physical names no live column may reuse: every
    rename's old name and every dropped column's name. Re-adding one
    via ADD COLUMNS would RESURRECT the stale values old files still
    physically carry (Delta prevents this with field ids; we prevent it
    by refusing the name)."""
    out: set[str] = set()
    for e in column_events(props):
        if e["op"] in ("rename", "drop"):
            out.add((e.get("old") or e.get("name")).lower())
    return out


def apply_events_cdf(df, events: list[dict[str, Any]]):
    """Overlay the events on a CHANGE-DATA frame ``(key, change, old
    struct, new struct, ...)`` written at one commit's era: top-level
    renames apply directly (the key column carries its era's name) and
    rename/widen/drop apply INSIDE the pre/post-image structs —
    preserving struct NULL-ness, so an insert's ``old`` stays NULL
    rather than becoming a struct of NULLs (which would flip its
    classification). Makes per-commit feed members from BEFORE a
    RENAME/DROP/WIDEN serve under the CURRENT logical schema — the
    O(changes) ``table_changes()`` fast path survives schema evolution
    instead of falling back to the O(table) snapshot diff."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    for e in events:
        have = {c.lower(): c for c in df.columns}
        if e["op"] == "rename":
            o = have.get(e["old"].lower())
            if o is not None and have.get(e["new"].lower()) is None:
                df = df.withColumnRenamed(o, e["new"])

    def _overlay(sc: str):
        nonlocal df
        dt = df.schema[sc].dataType
        if not isinstance(dt, StructType):
            return
        cols: dict[str, tuple[str, Any]] = {
            f.name.lower(): (f.name, F.col(sc)[f.name])
            for f in dt.fields
        }
        order = [f.name.lower() for f in dt.fields]
        changed = False
        for e in events:
            if e["op"] == "rename":
                ol, nl = e["old"].lower(), e["new"].lower()
                if ol in cols and nl in cols:
                    _, oexpr = cols[ol]
                    _, nexpr = cols[nl]
                    cols[nl] = (e["new"], F.coalesce(nexpr, oexpr))
                    del cols[ol]
                    order.remove(ol)
                    changed = True
                elif ol in cols:
                    _, oexpr = cols.pop(ol)
                    cols[nl] = (e["new"], oexpr)
                    order[order.index(ol)] = nl
                    changed = True
            elif e["op"] == "widen":
                nl = e["name"].lower()
                if nl in cols:
                    name, expr = cols[nl]
                    cols[nl] = (name, expr.cast(e["to"]))
                    changed = True
            else:  # drop
                nl = e["name"].lower()
                if nl in cols:
                    del cols[nl]
                    order.remove(nl)
                    changed = True
        if not changed or not order:
            return
        rebuilt = F.when(
            F.col(sc).isNotNull(),
            F.struct(*[cols[n][1].alias(cols[n][0]) for n in order]),
        )
        df = df.withColumn(sc, rebuilt)

    _overlay("old")
    _overlay("new")
    return df
