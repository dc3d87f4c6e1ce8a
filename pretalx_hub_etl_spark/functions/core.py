"""Scalar expression helpers pinning the reference's exact semantics.

Each helper is a pure composition of built-in JVM-side expressions (no
Python UDFs — these all stay inside whole-stage codegen). Citations are to
/root/reference (the surveyed public ETL script).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def falsy_coalesce(col: Column | str, default: Column | str | int | float) -> Column:
    """Python ``x or default`` semantics for string columns.

    The reference maps BOTH ``None`` and ``""`` (any falsy value) to the
    default (``talk["title"] or ""``, main.py:116,122,132). SQL ``coalesce``
    only handles NULL, so exact parity needs the empty-string branch too
    (SURVEY.md P3).
    """
    c = _c(col)
    d = default if isinstance(default, Column) else F.lit(default)
    return F.when(c.isNull() | (c == F.lit("")), d).otherwise(c)


def lowered_eq(left: Column | str, right: Column | str) -> Column:
    """Case-insensitive equality — the reference lowers both join sides
    (``.lower()`` at main.py:135,137,152,155; SURVEY.md P5).

    For joins, prefer projecting ``F.lower`` onto a key column once before
    the join (see operators.joins) so the comparison is computed O(n), not
    O(n·m) as in the reference's inner loop.
    """
    return F.lower(_c(left)) == F.lower(_c(right))


def found_after_first(haystack: Column | str, needle: str) -> Column:
    """Faithful port of ``haystack.lower().find(needle) > 0`` (main.py:242).

    Note the reference's off-by-one: a match at index 0 is MISSED (Python
    ``find`` returns 0, and ``0 > 0`` is False). SQL ``locate`` is 1-based,
    so the faithful translation is ``locate(...) > 1`` (SURVEY.md F4).
    """
    return F.locate(needle, F.lower(_c(haystack))) > 1


def plural_label(noun: str, items: Column | str) -> Column:
    """``"Noun{s}: a, b"`` formatting with the reference's conditional plural
    (``"" if len(x) == 1 else "s"``, main.py:125-127; SURVEY.md F2).

    ``items`` is an array<string> column; output is a single string.
    """
    c = _c(items)
    return F.concat(
        F.lit(noun),
        F.when(F.size(c) == 1, F.lit("")).otherwise(F.lit("s")),
        F.lit(": "),
        F.concat_ws(", ", c),
    )


def strict_map_lookup(mapping: dict, key: Column | str) -> Column:
    """Dict-style strict lookup (``MAP_ROOMS[room]``, main.py:120,123).

    A missing key raises at execution time — matching Python's ``KeyError``
    (Spark's ``element_at`` returns NULL on miss, silently; the reference
    crashes, and silent NULLs are how bad rows leak into a 100 TB output).
    For large mappings use a broadcast-join against a dim table instead
    (operators.joins.broadcast_lookup) with an anti-join miss check.
    """
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    k = _c(key)
    looked_up = F.element_at(F.create_map(*pairs), k)
    guard = F.assert_true(
        looked_up.isNotNull() | k.isNull(),
        F.concat(F.lit("strict_map_lookup: missing key "), k.cast("string")),
    )
    # assert_true returns NULL on success; the when() keeps it in the plan
    return F.when(guard.isNull(), looked_up)


def multi_key_lower(cols: Sequence[Column | str]) -> list[Column]:
    """Project lowered copies of several key columns (pre-join normalization)."""
    return [F.lower(_c(c)) for c in cols]


def parse_offset_ts(col: Column | str) -> Column:
    """Parse ``YYYY-MM-DDTHH:MM:SS±HH[:]MM`` accepting BOTH offset spellings.

    Python ``%z`` (reference main.py:128) accepts ``+01:00`` and ``+0100``;
    Spark's ``XXX`` pattern only takes the colon form, so the engine
    normalizes the offset first (SURVEY.md F5: "normalize at ingest").
    """
    normalized = F.regexp_replace(_c(col), r"([+-]\d{2})(\d{2})$", r"$1:$2")
    return F.to_timestamp(normalized, "yyyy-MM-dd'T'HH:mm:ssXXX")


def fixed_point(col: Column, scale: int = 2) -> Column:
    """Deterministic fixed-point quantization: floor(x·10^s + 0.5) / 10^s.

    The engine's replacement for ``round()`` in any cross-engine-compared
    output. Rationale: Spark's HALF_UP and DuckDB's rounding disagree on
    half-boundary doubles, and float SUMS are summation-order-dependent —
    but ``x·10^s + 0.5`` and ``floor`` are bitwise-identical IEEE ops in
    both engines, and the scaled BIGINTs sum exactly in any order. Quantize
    per row, aggregate the integers, divide once at the end.
    """
    m = float(10**scale)
    return F.floor(col * m + F.lit(0.5)).cast("long") / F.lit(m)


def fixed_cents(col: Column, scale: int = 2) -> Column:
    """The integer form of :func:`fixed_point` (for exact aggregation)."""
    m = float(10**scale)
    return F.floor(col * m + F.lit(0.5)).cast("long")
