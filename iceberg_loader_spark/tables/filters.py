"""Row-filter predicates: parse, translate to Spark, prune files.

The reference accepts PyIceberg row-filter strings like
``"ts == '2023-01-01'"`` for its idempotent-replace strategy
(``/root/reference src/iceberg_loader/core/strategies.py:64``,
``tests/test_iceberg_loader.py:119-122``). We accept the same surface:
conjunctions of ``col OP literal`` with OP ∈ {==, !=, <, <=, >, >=, IN}.

Two consumers:

* :func:`to_spark_sql` — rewrite to Spark SQL for the row-level filter.
* :func:`file_may_match` — conservative metadata-only test of one
  manifest entry (partition values + column min/max), used to pick the
  files a DELETE must rewrite. Returning True when unsure is always safe;
  returning False must be provably correct.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from iceberg_loader_spark.tables.format import DataFile
from iceberg_loader_spark.tables.partitioning import (
    PartitionField,
    python_eval,
)

_TERM_RE = re.compile(
    r"""^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(==|!=|<=|>=|<|>|(?i:IN))\s*(.+?)\s*$"""
)


@dataclass(frozen=True)
class Term:
    col: str
    op: str  # ==, !=, <, <=, >, >=, in
    value: object  # scalar or tuple for IN


def _parse_literal(s: str):
    s = s.strip()
    if s.startswith("(") and s.endswith(")"):
        return tuple(_parse_literal(p) for p in s[1:-1].split(","))
    if (s.startswith("'") and s.endswith("'")) or (s.startswith('"') and s.endswith('"')):
        return s[1:-1]
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    # unquoted bare value: must be a single token (no whitespace/operators),
    # otherwise we'd silently swallow things like "1 OR b == 2"
    if not re.fullmatch(r"[A-Za-z0-9_.:\-]+", s):
        raise ValueError(f"unsupported literal: {s!r}")
    return s


def parse_filter(expr: str) -> list[Term]:
    """Parse a conjunction of simple terms; raises ValueError otherwise."""
    terms = []
    for part in re.split(r"(?i)\s+and\s+", expr.strip()):
        m = _TERM_RE.match(part)
        if m is None:
            raise ValueError(f"unsupported filter term: {part!r}")
        col, op, lit = m.group(1), m.group(2).lower(), _parse_literal(m.group(3))
        terms.append(Term(col, "in" if op == "in" else op, lit))
    return terms


def to_spark_sql(expr: str) -> str:
    """PyIceberg-style filter → Spark SQL (just `==` → `=`)."""
    return re.sub(r"(?<![=!<>])==", "=", expr)


_TS_STAT_RE = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{6}$")
_DATEISH_RE = re.compile(r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?$")


def _normalize_dt_literal(v, bound):
    """Pad date-ish string literals to the timestamp-stat format so
    lexicographic comparison is correct ('2023-01-02' vs
    '2023-01-02 00:00:00.000000')."""
    import datetime as _dt

    if isinstance(bound, str) and isinstance(v, str):
        if _TS_STAT_RE.match(bound) and _DATEISH_RE.match(v) and not _TS_STAT_RE.match(v):
            try:
                return _dt.datetime.fromisoformat(v).strftime("%Y-%m-%d %H:%M:%S.%f")
            except ValueError:
                return v
    return v


def _term_may_match_range(term: Term, lo, hi) -> bool:
    """May a value in [lo, hi] satisfy the term? (None bound = unknown)"""
    v = term.value
    bound = lo if lo is not None else hi
    if term.op == "in" and isinstance(v, tuple):
        v = tuple(_normalize_dt_literal(x, bound) for x in v)
    else:
        v = _normalize_dt_literal(v, bound)
    try:
        if term.op == "==":
            return (lo is None or lo <= v) and (hi is None or v <= hi)
        if term.op == "<":
            return lo is None or lo < v
        if term.op == "<=":
            return lo is None or lo <= v
        if term.op == ">":
            return hi is None or hi > v
        if term.op == ">=":
            return hi is None or hi >= v
        if term.op == "in":
            return any(
                (lo is None or lo <= x) and (hi is None or x <= hi) for x in v
            )
    except TypeError:
        return True  # incomparable types → can't prune
    return True  # != never prunes a range


def file_may_match(
    terms: list[Term], f: DataFile, spec: list[PartitionField]
) -> bool:
    """Conservative: False only when metadata proves no row matches."""
    spec_by_source = {pf.source: pf for pf in spec}
    for term in terms:
        # 1) partition-value check via the transform mirror
        pf = spec_by_source.get(term.col)
        if pf is not None and pf.name in f.partition:
            pv = f.partition[pf.name]
            if pv is not None and term.op in ("==", "in"):
                values = term.value if term.op == "in" else (term.value,)
                try:
                    derived = {str(python_eval(pf, v)) for v in values}
                    if str(pv) not in derived:
                        return False
                except (NotImplementedError, ValueError, TypeError):
                    pass
        # 2) column min/max stats check
        stat = f.stats.get(term.col)
        if stat is not None:
            lo, hi = stat
            if not _term_may_match_range(term, lo, hi):
                return False
    return True


def file_fully_matches(terms: list[Term], f: DataFile) -> bool:
    """True only when metadata PROVES every row matches every term — the
    metadata-only DELETE fast path (file dropped, nothing rewritten).

    Proof used: equality/IN terms where the column's min==max equals the
    literal; range terms where the whole [min,max] lies inside the bound.
    """
    if not terms:
        return False
    for term in terms:
        stat = f.stats.get(term.col)
        if stat is None:
            return False
        lo, hi = stat
        v = term.value
        if term.op == "in" and isinstance(v, tuple):
            vs = tuple(_normalize_dt_literal(x, lo) for x in v)
            if not (lo == hi and lo in vs):
                return False
            continue
        v = _normalize_dt_literal(v, lo)
        try:
            if term.op == "==":
                if not (lo == hi == v):
                    return False
            elif term.op == "<":
                if not hi < v:
                    return False
            elif term.op == "<=":
                if not hi <= v:
                    return False
            elif term.op == ">":
                if not lo > v:
                    return False
            elif term.op == ">=":
                if not lo >= v:
                    return False
            else:  # != or unknown — no whole-file proof attempted
                return False
        except TypeError:
            return False
    return True


def split_delete_candidates(
    expr: str, files: list[DataFile], spec: list[PartitionField]
) -> tuple[list[DataFile], list[DataFile], list[DataFile]]:
    """(fully_matching → drop, partial → rewrite, clean → carry over)."""
    may, clean = prune_files(expr, files, spec)
    try:
        terms = parse_filter(expr)
    except ValueError:
        return [], may, clean
    full = [f for f in may if file_fully_matches(terms, f)]
    full_paths = {f.path for f in full}
    partial = [f for f in may if f.path not in full_paths]
    return full, partial, clean


def prune_files(
    expr: str | None, files: list[DataFile], spec: list[PartitionField]
) -> tuple[list[DataFile], list[DataFile]]:
    """Split files into (may_match, provably_clean) for ``expr``.

    Unparseable expressions prune nothing (correct, just slower).
    """
    if not expr:
        return list(files), []
    try:
        terms = parse_filter(expr)
    except ValueError:
        return list(files), []
    may, clean = [], []
    for f in files:
        (may if file_may_match(terms, f, spec) else clean).append(f)
    return may, clean
