"""Extract manifest-prunable WHERE conjuncts from a SQL statement.

The engine API (`MergeSink.read_pruned` / `read_where`) skips files
whose manifest [min, max] envelopes are provably disjoint from a
predicate — but a SQL consumer writes ``cat.sql("SELECT ... FROM t
WHERE k < 5")`` and (before round 13) paid the full file listing. This
module closes that gap driver-side: given the statement text and one
registered table, it returns the ``(column, lo, hi)`` conjunct ranges
that are SOUND to prune with, or ``[]`` when nothing is extractable.

Soundness rules (every rule errs toward returning LESS — an
unextractable conjunct merely keeps more files, never drops rows):

- Per OCCURRENCE: each FROM/JOIN occurrence of the table gets its own
  prune set, and the catalog rewrites each pruned occurrence to its
  OWN uniquely-named temp view (own relation, own file list) — never
  pruning the shared plain view, which is the cross-wiring the Spark
  4.1 scan-collapse pin demonstrates
  (tests/test_round12.py::test_one_view_multi_reference_union_correct).
- Only the WHERE of the occurrence's OWN query block (same paren
  depth, before GROUP/ORDER/HAVING/LIMIT/set-ops): a WHERE above a
  subquery filters the subquery's output, not this scan.
- A top-level OR anywhere in that WHERE bails the whole clause:
  ``a = 1 OR b = 2 AND c = 3`` parses as ``a=1 OR (b=2 AND c=3)``,
  so no AND-split factor is a true conjunct of the filter.
- A conjunct binds to the table only via its alias/name qualifier or
  a bare column the table provably has (manifest stats name). A
  misattributed bare column is still safe — ``files_for`` keeps every
  file that lacks stats for the named column — but we filter anyway.
- Extracted shapes: ``col <op> literal`` (and reversed),
  ``col BETWEEN a AND b``, ``col IN (lit, ...)``. Everything else
  (functions, subqueries, quoted identifiers, OR-groups) is skipped.

NULL semantics: every extracted conjunct is FALSE for NULL, so a file
kept/skipped purely on non-null min/max stats cannot lose rows the
predicate would keep.
"""

from __future__ import annotations

import re

from ..sinks.manifest import UNBOUNDED_HI, UNBOUNDED_LO

# words that cannot be a relation alias (so `FROM t WHERE ...` does not
# read WHERE as t's alias)
_NOT_ALIAS = {
    "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "WINDOW", "UNION",
    "INTERSECT", "EXCEPT", "JOIN", "LEFT", "RIGHT", "FULL", "INNER",
    "CROSS", "NATURAL", "ANTI", "SEMI", "LATERAL", "ON", "USING",
    "VERSION", "TIMESTAMP", "AS", "QUALIFY", "DISTRIBUTE", "SORT",
    "CLUSTER", "LATERAL", "TABLESAMPLE", "PIVOT", "UNPIVOT",
}
#: keywords that terminate the block's WHERE clause (at block depth)
_CLAUSE_END = {
    "GROUP", "ORDER", "HAVING", "LIMIT", "WINDOW", "UNION",
    "INTERSECT", "EXCEPT", "QUALIFY", "DISTRIBUTE", "SORT", "CLUSTER",
}

_TOKEN_RE = re.compile(
    r"""
      '(?:[^']|'')*'              # string literal ('' escape)
    | --[^\n]*                    # line comment (dropped)
    | /\*(?s:.*?)\*/               # block comment (dropped)
    | `[^`]*`                     # backquoted identifier
    | [A-Za-z_][\w$]*             # word
    | \d+(?:\.\d+)?(?:[eE][+-]?\d+)?  # number
    | <> | != | <= | >= | \|\| | [(),=<>.*+/%;-]
    """,
    re.VERBOSE,
)

_IDENT = r"(?:([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)"
_LIT = r"(-?\s*\d+(?:\.\d+)?|'(?:[^']|'')*')"
_CMP_RE = re.compile(rf"^\s*{_IDENT}\s*(=|<=|>=|<|>)\s*{_LIT}\s*$")
_CMP_REV_RE = re.compile(rf"^\s*{_LIT}\s*(=|<=|>=|<|>)\s*{_IDENT}\s*$")
_BETWEEN_RE = re.compile(
    rf"^\s*{_IDENT}\s+BETWEEN\s+{_LIT}\s+AND\s+{_LIT}\s*$", re.IGNORECASE
)
_IN_RE = re.compile(
    rf"^\s*{_IDENT}\s+IN\s*\(\s*{_LIT}(?:\s*,\s*{_LIT})*\s*\)\s*$",
    re.IGNORECASE,
)
_LIT_FIND_RE = re.compile(_LIT)
_FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "="}


def _tokens(sql: str) -> list[tuple[str, int, int, int]]:
    """(text, start, end, depth) per token; depth = paren nesting the
    token sits IN (a ')' carries the depth it closes)."""
    out = []
    depth = 0
    for m in _TOKEN_RE.finditer(sql):
        t = m.group(0)
        if t.startswith("--") or t.startswith("/*"):
            # comments are NOT part of the statement Spark executes:
            # extracting a commented-out conjunct would prune files the
            # real query needs (soundness), so they vanish here
            continue
        if t == "(":
            out.append((t, m.start(), m.end(), depth))
            depth += 1
        elif t == ")":
            out.append((t, m.start(), m.end(), depth))
            depth = max(0, depth - 1)
        else:
            out.append((t, m.start(), m.end(), depth))
    return out


def _lit_val(s: str):
    s = s.strip()
    if s.startswith("'"):
        return s[1:-1].replace("''", "'")
    s = s.replace(" ", "")
    return float(s) if ("." in s or "e" in s or "E" in s) else int(s)


def _range_for(op: str, v):
    if op == "=":
        return (v, v)
    if op in ("<", "<="):
        return (UNBOUNDED_LO, v)
    return (v, UNBOUNDED_HI)  # > or >=


def extract_prunes(
    sql: str, table: str, table_cols: set[str]
) -> list[tuple[str, object, object]]:
    """``(column, lo, hi)`` conjunct ranges sound for manifest pruning
    of ``table``'s single scan in ``sql``; [] when none (including when
    the table is referenced more than once — use
    :func:`extract_scan_prunes` for the per-occurrence form).
    ``table_cols`` are the table's stat-bearing column names."""
    occs = extract_scan_prunes(sql, table, table_cols)
    if len(occs) != 1:
        return []
    return occs[0].prunes


class ScanOccurrence:
    """One relation occurrence of a table in a statement: the char span
    of its table token, its alias (None when unaliased), and the sound
    prune ranges extracted from its own query block's WHERE."""

    __slots__ = ("start", "end", "alias", "prunes")

    def __init__(self, start, end, alias, prunes):
        self.start = start
        self.end = end
        self.alias = alias
        self.prunes = prunes


def extract_scan_prunes(
    sql: str, table: str, table_cols: set[str]
) -> list[ScanOccurrence]:
    """Every FROM/JOIN occurrence of ``table`` with its own sound prune
    ranges — the per-occurrence form: each occurrence's conjuncts come
    from ITS query block and bind via ITS alias, so a statement that
    scans the table twice with different predicates (UNION branches,
    self-joins) prunes each scan independently. Sound because the SQL
    catalog rewrites each pruned occurrence to its OWN temp view (own
    relation, own file list) — the shared-relation cross-wiring the
    Spark 4.1 scan-collapse pin demonstrates cannot happen here."""
    toks = _tokens(sql)
    tl = table.lower()
    lower_cols = {c.lower(): c for c in table_cols}
    return [
        _analyze_occurrence(sql, toks, i, tl, lower_cols)
        for i in range(1, len(toks))
        if toks[i][0].lower() == tl
        and toks[i - 1][0].upper() in ("FROM", "JOIN")
    ]


def _analyze_occurrence(
    sql: str, toks: list, i: int, tl: str, lower_cols: dict
) -> ScanOccurrence:
    d = toks[i][3]
    span = (toks[i][1], toks[i][2])

    def bail(alias):
        return ScanOccurrence(span[0], span[1], alias, [])

    # -- optional alias
    alias = None
    j = i + 1
    if j < len(toks) and toks[j][0].startswith("`"):
        # backquoted alias: the occurrence rewrite would inject a
        # second alias before it — bail, the plain view serves this
        return bail(None)
    if j < len(toks) and toks[j][0].upper() == "AS":
        j += 1
        if j < len(toks) and re.fullmatch(r"[A-Za-z_]\w*", toks[j][0]):
            alias = toks[j][0]
            j += 1
        else:
            return bail(None)  # AS `quoted` / AS <non-ident>: bail
    elif (
        j < len(toks)
        and re.fullmatch(r"[A-Za-z_]\w*", toks[j][0])
        and toks[j][0].upper() not in _NOT_ALIAS
    ):
        alias = toks[j][0]
        j += 1

    # -- find this block's WHERE at the occurrence depth
    w = None
    while j < len(toks):
        t, _s, _e, td = toks[j]
        if t in (")", ";") and td == d:
            return bail(alias)  # block closed without a WHERE
        if td == d:
            u = t.upper()
            if u == "WHERE":
                w = j
                break
            if u in _CLAUSE_END:
                return bail(alias)
        j += 1
    if w is None:
        return bail(alias)

    # -- clause token span (w+1 .. end-of-block)
    k = w + 1
    end = len(toks)
    while k < len(toks):
        t, _s, _e, td = toks[k]
        if td == d and (t in (")", ";") or t.upper() in _CLAUSE_END):
            end = k
            break
        k += 1
    clause = toks[w + 1 : end]
    if not clause:
        return bail(alias)
    if any(t.upper() == "OR" and td == d for t, _s, _e, td in clause):
        return bail(alias)  # AND-split factors would not be true conjuncts

    # -- split on block-depth AND (skipping each BETWEEN's own AND)
    conjuncts: list[list] = [[]]
    pending_between = 0
    for tok in clause:
        t, _s, _e, td = tok
        u = t.upper()
        if td == d and u == "BETWEEN":
            pending_between += 1
        if td == d and u == "AND":
            if pending_between:
                pending_between -= 1
            else:
                conjuncts.append([])
                continue
        conjuncts[-1].append(tok)

    def resolve(qual: str | None, col: str) -> str | None:
        if qual is not None:
            q = qual.lower()
            if q != tl and (alias is None or q != alias.lower()):
                return None
        return lower_cols.get(col.lower())

    out: list[tuple[str, object, object]] = []
    for c in conjuncts:
        if not c:
            continue
        text = sql[c[0][1] : c[-1][2]]
        m = _CMP_RE.match(text)
        if m is not None:
            col = resolve(m.group(1), m.group(2))
            if col is not None:
                lo, hi = _range_for(m.group(3), _lit_val(m.group(4)))
                out.append((col, lo, hi))
            continue
        m = _CMP_REV_RE.match(text)
        if m is not None:
            col = resolve(m.group(3), m.group(4))
            if col is not None:
                lo, hi = _range_for(
                    _FLIP[m.group(2)], _lit_val(m.group(1))
                )
                out.append((col, lo, hi))
            continue
        m = _BETWEEN_RE.match(text)
        if m is not None:
            col = resolve(m.group(1), m.group(2))
            if col is not None:
                out.append((col, _lit_val(m.group(3)), _lit_val(m.group(4))))
            continue
        m = _IN_RE.match(text)
        if m is not None:
            col = resolve(m.group(1), m.group(2))
            if col is not None:
                # the first '(' starts the literal list (identifiers
                # cannot contain parens)
                vals = [
                    _lit_val(g.group(0))
                    for g in _LIT_FIND_RE.finditer(text[text.index("(") :])
                ]
                kinds = {isinstance(v, str) for v in vals}
                if len(kinds) == 1 and vals:
                    out.append((col, min(vals), max(vals)))
            continue
        # anything else: not extractable — sound to ignore
    return ScanOccurrence(span[0], span[1], alias, out)


def needs_plain_view(sql: str, table: str) -> bool:
    """True when the (post-rewrite) statement still contains a mention
    of ``table`` that could be a RELATION reference needing the plain
    view. Skipped mentions: ``t.`` qualifiers (next token is '.') and
    the alias slot the scan-view rewrite injects (previous token is a
    ``<table>__scan_*`` view name). Everything else — un-rewritten
    FROM/JOIN occurrences, comma-join relations, anything ambiguous —
    keeps the plain view registered (erring toward registering is
    always safe; the view is just unused)."""
    toks = _tokens(sql)
    tl = table.lower()
    for i, (t, _s, _e, _d) in enumerate(toks):
        if t.lower() != tl:
            continue
        if i + 1 < len(toks) and toks[i + 1][0] == ".":
            continue  # qualifier t.col
        if i > 0 and toks[i - 1][0].lower().startswith(tl + "__scan_"):
            continue  # the alias the scan-view rewrite injected
        return True
    return False
