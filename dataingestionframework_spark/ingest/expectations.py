"""Declarative data-quality expectations over a DataFrame.

The reference validates CONFIG (JSON-Schema, header ids — C1/C2) and
quarantines structurally corrupt records (T6); this adds the missing
third layer a production ingestion framework needs: RULE-level checks
on the data itself (not-null, unique, range, set membership, regex) —
the Great-Expectations/dbt-test shape, Spark-first.

All rules evaluate in ONE wide aggregate (a single job whatever the
rule count; at 100 TB per-rule queries would each rescan the table).
``unique`` is count - countDistinct over non-null values: 0 extras ⇔
no duplicated value. The 1-row result pivots driver-side into one
report row per rule.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One rule: ``kind`` ∈ not_null | unique | between | in_set | matches."""

    name: str
    column: str
    kind: str
    lo: float | None = None
    hi: float | None = None
    allowed: tuple = field(default=())
    pattern: str | None = None

    def _fail_agg(self) -> Column:
        c = F.col(self.column)
        if self.kind == "not_null":
            bad = c.isNull()
        elif self.kind == "unique":
            return (F.count(c) - F.countDistinct(c)).alias(self.name)
        elif self.kind == "between":
            bad = ~c.between(self.lo, self.hi)
        elif self.kind == "in_set":
            bad = ~c.isin(*self.allowed)
        elif self.kind == "matches":
            bad = ~c.rlike(self.pattern)
        else:
            raise ValueError(f"unknown expectation kind {self.kind!r}")
        return F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias(self.name)


def evaluate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate every rule in one aggregate pass.

    Output: (rule, column, kind, n_rows, n_failed, passed) per rule.
    """
    row = df.agg(
        F.count(F.lit(1)).alias("__n"), *[e._fail_agg() for e in expectations]
    ).first()
    n = row["__n"]
    out = [
        # an aggregate over ZERO rows yields NULL, not 0: zero rows
        # contain zero violations, so every rule passes vacuously
        (e.name, e.column, e.kind, n, int(row[e.name] or 0),
         int(row[e.name] or 0) == 0)
        for e in expectations
    ]
    return df.sparkSession.createDataFrame(
        out,
        "rule string, column string, kind string, n_rows long, "
        "n_failed long, passed boolean",
    )


def row_violation(e: Expectation) -> Column:
    """Boolean column: this row violates ``e``. Aggregate-level kinds
    (``unique``) have no row predicate — ValueError."""
    c = F.col(e.column)
    if e.kind == "not_null":
        return c.isNull()
    if e.kind == "between":
        return ~F.coalesce(c.between(e.lo, e.hi), F.lit(True))
    if e.kind == "in_set":
        return ~F.coalesce(c.isin(*e.allowed), F.lit(True))
    if e.kind == "matches":
        return ~F.coalesce(c.rlike(e.pattern), F.lit(True))
    raise ValueError(f"expectation kind {e.kind!r} has no row-level predicate")


def split_valid(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Route rows by the row-level rules: (valid, violations).

    Violations carry ``_failed_rules`` (comma-joined rule names) for
    the quarantine record. Aggregate-level rules (``unique``) are
    skipped here — run them via :func:`evaluate` as a batch verdict.
    NULL values only fail ``not_null`` (range/set/regex rules treat
    NULL as not-applicable, matching SQL three-valued logic).
    """
    rules = [e for e in expectations if e.kind != "unique"]
    if not rules:
        return df, df.limit(0).withColumn("_failed_rules", F.lit(""))
    flags = [(e.name, row_violation(e)) for e in rules]
    failed = F.concat_ws(
        ",", *[F.when(bad, F.lit(name)) for name, bad in flags]
    )
    any_bad = flags[0][1]
    for _, bad in flags[1:]:
        any_bad = any_bad | bad
    viol = df.filter(any_bad).withColumn("_failed_rules", failed)
    return df.filter(~any_bad), viol
