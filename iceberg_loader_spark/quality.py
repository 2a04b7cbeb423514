"""Declarative data-quality checks (the Deequ/dbt-test shape).

A :class:`Check` declares constraints against a DataFrame; ``run``
evaluates ALL row-level constraints in ONE aggregation pass (each
constraint is a conditional-sum violation counter inside a single
``agg``), plus one tiny aggregate per uniqueness constraint and one
broadcast anti-join per foreign-key constraint. The result is a report
DataFrame — (constraint, column, n_violations, passed) — that a
pipeline gates on before publishing a snapshot.

Scale: the row-level pass is a single partial-aggregated scan (no
shuffle beyond the final 1-row combine); uniqueness is one hash
aggregate on the key; FK checks broadcast the primary side's keys when
small and shuffle otherwise — identical cost profile to the dbt-test /
Deequ equivalents on Spark.

Usage::

    report = (
        Check()
        .not_null("l_orderkey")
        .unique("l_orderkey", "l_linenumber")
        .in_range("l_quantity", 1, 50)
        .non_negative("l_extendedprice")
        .accepted_values("l_returnflag", ["A", "N", "R"])
        .matches("l_shipinstruct", "^[A-Z ]+$")
        .foreign_key("l_orderkey", orders_df, "o_orderkey")
        .run(lineitem_df)
    )
    assert report.filter("NOT passed").count() == 0
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class _RowRule:
    name: str  # constraint kind
    column: str
    violation: object  # Column predicate: TRUE when the row violates


@dataclass
class Check:
    """A declarative set of constraints; immutable-ish builder."""

    row_rules: list = field(default_factory=list)
    unique_keys: list = field(default_factory=list)  # list[tuple[str, ...]]
    fk_rules: list = field(default_factory=list)  # (col, other_df, other_col)

    # ---- row-level constraints (one shared scan) -------------------------

    def not_null(self, *cols: str) -> "Check":
        for c in cols:
            self.row_rules.append(
                _RowRule("not_null", c, F.col(c).isNull())
            )
        return self

    def in_range(self, col: str, lo, hi) -> "Check":
        self.row_rules.append(
            _RowRule(
                "in_range",
                col,
                F.col(col).isNull()
                | (F.col(col) < F.lit(lo))
                | (F.col(col) > F.lit(hi)),
            )
        )
        return self

    def non_negative(self, *cols: str) -> "Check":
        for c in cols:
            self.row_rules.append(
                _RowRule(
                    "non_negative",
                    c,
                    F.col(c).isNull() | (F.col(c) < 0),
                )
            )
        return self

    def accepted_values(self, col: str, values: list) -> "Check":
        self.row_rules.append(
            _RowRule(
                "accepted_values",
                col,
                ~F.col(col).isin(list(values)) | F.col(col).isNull(),
            )
        )
        return self

    def matches(self, col: str, pattern: str) -> "Check":
        self.row_rules.append(
            _RowRule(
                "matches",
                col,
                F.col(col).isNull() | ~F.col(col).rlike(pattern),
            )
        )
        return self

    def satisfies(self, name: str, predicate) -> "Check":
        """Custom constraint: ``predicate`` is a Column that is TRUE for
        VALID rows (negated internally into a violation counter)."""
        self.row_rules.append(
            _RowRule("satisfies", name, ~predicate | predicate.isNull())
        )
        return self

    # ---- aggregate constraints ------------------------------------------

    def unique(self, *cols: str) -> "Check":
        if not cols:
            raise ValueError("unique() needs at least one column")
        self.unique_keys.append(tuple(cols))
        return self

    def foreign_key(
        self, col: str, other: DataFrame, other_col: str
    ) -> "Check":
        self.fk_rules.append((col, other, other_col))
        return self

    # ---- evaluation ------------------------------------------------------

    def run(self, df: DataFrame) -> DataFrame:
        """Evaluate every constraint; returns the report DataFrame
        (constraint, column, n_violations, passed) in declaration order
        (row rules first, then unique, then foreign keys)."""
        spark = df.sparkSession
        rows: list[tuple] = []

        if self.row_rules:
            aggs = [
                F.sum(
                    F.when(r.violation, 1).otherwise(0)
                ).cast("long").alias(f"_v{i}")
                for i, r in enumerate(self.row_rules)
            ]
            vals = df.agg(*aggs).first()
            for i, r in enumerate(self.row_rules):
                n = int(vals[f"_v{i}"] or 0)
                rows.append((r.name, r.column, n, n == 0))

        for key in self.unique_keys:
            n_dup_groups = (
                df.groupBy(*[F.col(c) for c in key])
                .count()
                .filter(F.col("count") > 1)
                .count()
            )
            rows.append(
                ("unique", ",".join(key), int(n_dup_groups), n_dup_groups == 0)
            )

        for col, other, other_col in self.fk_rules:
            orphans = (
                df.filter(F.col(col).isNotNull())
                .join(
                    other.select(F.col(other_col).alias(col)).distinct(),
                    col,
                    "left_anti",
                )
                .count()
            )
            rows.append(
                (f"foreign_key({other_col})", col, int(orphans), orphans == 0)
            )

        return spark.createDataFrame(
            rows,
            "constraint string, column string, n_violations long, "
            "passed boolean",
        )
