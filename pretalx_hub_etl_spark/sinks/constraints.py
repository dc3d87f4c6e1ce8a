"""Table invariants: CHECK constraints and NOT NULL columns (S41).

Constraints are table properties (``constraint.<name> = <sql expr>``,
``notnull.<col> = true``) enforced at the COMMIT PROTOCOL level — every
write that stages data through :class:`~..sinks.merge.MergeSink` or
:class:`~..sinks.mor.MorTable` (and the supported DataSource entry
``write_table``) evaluates them IN-FLIGHT inside the write job itself
via ``assert_true`` fused into the scan→write stage: zero extra pass
over the data, zero cost when no constraints are declared (one tiny
table-props read per commit). This is the Delta invariant model — the
writer task throws on the first violating row, the staged commit is
aborted, and the table version never advances.

Semantics are ANSI CHECK: a row passes when the expression evaluates
to TRUE **or NULL** (unknown accepts), fails only on FALSE. NOT NULL
fails on a NULL in the named column. ``ALTER TABLE ... ADD CONSTRAINT``
validates the CURRENT table state before persisting the property, so
"all live rows satisfy all active constraints" is a maintained table
invariant; RESTORE re-validates through the same write path, so a
table cannot be restored into a state that violates a constraint added
after the restore target (the commit aborts cleanly at the stage).

No reference counterpart (the reference has no storage layer); modeled
on the public Delta Lake constraint surface.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHECK_PREFIX = "constraint."
NOTNULL_PREFIX = "notnull."


def active_constraints(
    props: dict[str, Any],
) -> tuple[dict[str, str], list[str]]:
    """(check-name -> sql expr, [not-null column, ...]) from table props."""
    checks = {
        k[len(CHECK_PREFIX):]: str(v)
        for k, v in props.items()
        if k.startswith(CHECK_PREFIX) and str(v).strip()
    }
    notnull = [
        k[len(NOTNULL_PREFIX):]
        for k, v in props.items()
        if k.startswith(NOTNULL_PREFIX)
        and str(v).strip().lower() in ("true", "1")
    ]
    return checks, sorted(notnull)


def _check_ok(expr: str) -> Column:
    # ANSI CHECK: TRUE and UNKNOWN(NULL) pass, FALSE fails
    cond = F.expr(expr).cast("boolean")
    return cond.isNull() | cond


def violation_predicate(props: dict[str, Any]) -> Column | None:
    """One boolean column that is TRUE on a violating row, or None when
    the table declares no constraints (used by ADD-time validation and
    by tests; the write path uses :func:`apply_invariants` instead so
    the failure carries the constraint name)."""
    checks, notnull = active_constraints(props)
    preds: list[Column] = [~_check_ok(e) for e in checks.values()]
    preds.extend(F.col(c).isNull() for c in notnull)
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def apply_invariants(df: DataFrame, props: dict[str, Any]) -> DataFrame:
    """Return ``df`` guarded by the table's constraints: evaluation is
    fused into whatever job consumes the frame (the commit's parquet
    write), and the first violating row raises from inside that job
    with the constraint's name — the standard in-flight invariant
    pattern (``filter(assert_true(ok).isNull())`` keeps every passing
    row because ``assert_true`` returns NULL, and throws otherwise).

    Raises ``ValueError`` immediately (before any write) when a
    constraint references a column the frame does not carry — e.g. a
    declared-but-unmaterialized ALTER column: the constraint cannot be
    evaluated, which is a caller error, not a data violation."""
    checks, notnull = active_constraints(props)
    if not checks and not notnull:
        return df
    from pyspark.errors.exceptions.captured import AnalysisException

    have = {c.lower() for c in df.columns}
    for col in notnull:
        if col.lower() not in have:
            raise ValueError(
                f"NOT NULL constraint on {col!r}: column not present in "
                f"the written data ({sorted(df.columns)})"
            )
        df = df.filter(
            F.assert_true(
                F.col(col).isNotNull(),
                F.lit(
                    f"NOT NULL constraint violated: column {col!r} is NULL"
                ),
            ).isNull()
        )
    for name, expr in checks.items():
        try:
            guarded = df.filter(
                F.assert_true(
                    _check_ok(expr),
                    F.lit(f"CHECK constraint {name!r} ({expr}) violated"),
                ).isNull()
            )
            guarded.schema  # force analysis NOW for a clean error site
        except AnalysisException as exc:
            raise ValueError(
                f"CHECK constraint {name!r} ({expr}) cannot be evaluated "
                f"on the written data (columns {sorted(df.columns)}): {exc}"
            ) from exc
        df = guarded
    return df


def validate_existing(
    df: DataFrame, ok: Column, what: str
) -> None:
    """ADD-time gate: raise if any CURRENT row fails ``ok`` (the
    to-be-added constraint), so persisting the property establishes the
    all-live-rows invariant. One ``limit(1)`` job, short-circuits at the
    first violation."""
    bad = df.filter(~(ok.isNull() | ok))
    hit = bad.limit(1).collect()
    if hit:
        raise ValueError(
            f"cannot add {what}: existing row violates it "
            f"(first hit: {hit[0].asDict()})"
        )


GENERATED_PREFIX = "generated."
DEFAULT_PREFIX = "default."
IDENTITY_PREFIX = "identity."


def default_columns(props: dict[str, Any]) -> dict[str, str]:
    """col -> DEFAULT literal expr from table props (``default.<col>``,
    S49): fills the column when an INSERT omits it."""
    return {
        k[len(DEFAULT_PREFIX):]: str(v)
        for k, v in props.items()
        if k.startswith(DEFAULT_PREFIX) and str(v).strip()
    }


def identity_columns(props: dict[str, Any]) -> list[str]:
    """GENERATED ALWAYS AS IDENTITY columns (``identity.<col>``, S49):
    assigned monotonic collision-free values by the commit protocol
    itself (MergeSink.init/append — the assignment re-derives against
    the new base when the OCC claim is lost, so two racing appends can
    never mint the same key)."""
    return sorted(
        k[len(IDENTITY_PREFIX):]
        for k, v in props.items()
        if k.startswith(IDENTITY_PREFIX)
        and str(v).strip().lower() in ("true", "1")
    )


def generated_columns(props: dict[str, Any]) -> dict[str, str]:
    """col -> generation expr from table props (``generated.<col>``)."""
    return {
        k[len(GENERATED_PREFIX):]: str(v)
        for k, v in props.items()
        if k.startswith(GENERATED_PREFIX) and str(v).strip()
    }


def apply_generated(df: DataFrame, props: dict[str, Any]) -> DataFrame:
    """Materialize GENERATED ALWAYS AS columns at write time (the Delta
    contract): a column ABSENT from the written data is computed from
    its expression; a column PRESENT is validated value-equals-expr
    (null-safe) in-flight, so a writer cannot smuggle a value the
    expression would not produce. Like :func:`apply_invariants`, the
    work rides inside the commit's own write job — no extra pass."""
    gens = generated_columns(props)
    if not gens:
        return df
    have = {c.lower() for c in df.columns}
    for col, expr in gens.items():
        if col.lower() not in have:
            df = df.withColumn(col, F.expr(expr))
        else:
            df = df.filter(
                F.assert_true(
                    F.col(col).eqNullSafe(F.expr(expr)),
                    F.lit(
                        f"GENERATED column {col!r} violated: supplied "
                        f"value != {expr}"
                    ),
                ).isNull()
            )
    return df
