"""FeatureQuery facade — the reference's query algebra over DataFrames.

Mirrors S/FeatureQuery.java (javadoc: "mimics SQL SELECT", :62-73):
projection (:257 NamedExpression + alias), selection (:298), offset/limit
(:339,371), multi-key null-aware sort (:398 + S/base/SortByComparator.java).
Execution order matches FeatureSubset.features (S/FeatureSubset.java:134-168):
filter -> sort -> skip/limit -> project.

Null/NaN comparison semantics (F/filter/ComparisonFilter.java:40-43): a null
or NaN operand makes the predicate FALSE — under a Spark WHERE, null-result
rows drop, which matches; NaN needs the explicit guard provided by
``comparison`` below (Spark compares NaN as largest, SIS drops it).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def comparison(left: Column, op: str, right: Column, nan_safe: bool = False) -> Column:
    """SIS ComparisonFilter: a null or NaN operand makes the predicate false
    (F/filter/ComparisonFilter.java:40-43).  Null already yields
    false-under-WHERE in Spark; pass ``nan_safe=True`` for floating columns
    to also drop NaN operands (Spark otherwise sorts NaN as largest)."""
    ops = {
        "=": left == right, "<>": left != right, "<": left < right,
        ">": left > right, "<=": left <= right, ">=": left >= right,
    }
    c = ops[op]
    if nan_safe:
        c = c & ~F.isnan(left) & ~F.isnan(right)
    return c


@dataclass
class SortProperty:
    """DefaultSortProperty (F/filter/DefaultSortProperty.java:161):
    null ordering is explicit, default nulls last for asc."""
    column: str
    ascending: bool = True
    nulls_first: bool | None = None

    def to_col(self) -> Column:
        c = F.col(self.column)
        nf = self.nulls_first if self.nulls_first is not None else not self.ascending
        if self.ascending:
            return c.asc_nulls_first() if nf else c.asc_nulls_last()
        return c.desc_nulls_first() if nf else c.desc_nulls_last()


@dataclass
class FeatureQuery:
    projection: list[tuple[Column, str]] | None = None  # (expr, alias) pairs
    selection: Column | None = None
    sort_by: list[SortProperty] = field(default_factory=list)
    offset: int = 0
    limit: int | None = None
    # linear-resolution hint (S/FeatureQuery.java:437 setLinearResolution):
    # geometry columns in the result may be simplified to this resolution
    linear_resolution: float | None = None
    geometry_columns: list[str] = field(default_factory=list)

    def set_projection(self, *pairs):
        self.projection = list(pairs)
        return self

    def set_selection(self, cond: Column):
        self.selection = cond
        return self

    def set_sort_by(self, *props: SortProperty):
        self.sort_by = list(props)
        return self

    def set_offset(self, n: int):
        self.offset = n
        return self

    def set_limit(self, n: int):
        self.limit = n
        return self

    def set_linear_resolution(self, res: float, *geometry_columns: str):
        """LOD hint: WKB geometry columns listed are Douglas-Peucker
        simplified to ``res`` in the result (the reference treats this as a
        non-binding optimization hint; here it is applied deterministically
        at the end of the pipeline)."""
        self.linear_resolution = res
        self.geometry_columns = list(geometry_columns)
        return self

    def execute(self, df: DataFrame) -> DataFrame:
        """FeatureSubset pipeline order: filter → sort → skip/limit → project."""
        out = df
        if self.selection is not None:
            out = out.filter(self.selection)
        if self.sort_by:
            out = out.orderBy(*[s.to_col() for s in self.sort_by])
        if self.offset:
            out = out.offset(self.offset)
        if self.limit is not None:
            out = out.limit(self.limit)
        if self.projection is not None:
            out = out.select(*[e.alias(a) for e, a in self.projection])
        if self.linear_resolution is not None and self.geometry_columns:
            from ..functions.sqlmm import st_simplify_udf

            simp = st_simplify_udf(self.linear_resolution)
            for gc in self.geometry_columns:
                if gc in out.columns:
                    out = out.withColumn(gc, simp(F.col(gc)))
        return out


def bbox_filter(lon: Column, lat: Column, xmin: float, ymin: float, xmax: float, ymax: float) -> Column:
    """Envelope selection (FeatureQuery.setSelection(Envelope),
    S/FeatureQuery.java:298-316) with the anti-meridian wraparound SPLIT rule
    (xmin > xmax ⇒ two boxes, R/geometry/WraparoundMethod.java:55)."""
    y = (lat >= F.lit(ymin)) & (lat <= F.lit(ymax))
    if xmin > xmax:
        x = (lon >= F.lit(xmin)) | (lon <= F.lit(xmax))
    else:
        x = (lon >= F.lit(xmin)) & (lon <= F.lit(xmax))
    return x & y


def join_features(
    left: DataFrame, right: DataFrame, left_on: str, right_on: str, how: str = "inner"
) -> DataFrame:
    """JoinFeatureSet semantics (S/aggregate/JoinFeatureSet.java:74):
    equi-join where **null matches null** (:498-502 uses an isNull filter when
    the main value is null) — Spark's `<=>` (eqNullSafe).
    Join types: INNER / LEFT_OUTER / RIGHT_OUTER (:78-131)."""
    return left.join(right, left[left_on].eqNullSafe(right[right_on]), how)


def concat_feature_sets(*dfs: DataFrame) -> DataFrame:
    """ConcatenatedFeatureSet (S/aggregate/ConcatenatedFeatureSet.java:65):
    UNION ALL with common-schema reconciliation — unionByName allowing
    missing columns (nulls fill, like the common-supertype rule)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def multi_comparison(arr: Column, op: str, right: Column, match_action: str = "ANY",
                     nan_safe: bool = False) -> Column:
    """MatchAction semantics for multi-valued attributes
    (F/filter/ComparisonFilter.java:79-82 evaluate(Iterable), MatchAction
    enum ANY/ALL/ONE per the Filter Encoding spec):

    * ANY — some element satisfies the comparison (Spark ``exists``),
    * ALL — every element does (``forall``; true for an empty collection,
      matching the reference's vacuous-truth loop :421-431),
    * ONE — exactly one element does (size of ``filter`` == 1).

    A NULL array yields NULL (false under WHERE), matching the null-operand
    rule of scalar comparisons."""
    pred = lambda x: comparison(x, op, right, nan_safe)  # noqa: E731
    ma = match_action.upper()
    if ma == "ANY":
        return F.exists(arr, pred)
    if ma == "ALL":
        return F.forall(arr, pred)
    if ma == "ONE":
        return F.size(F.filter(arr, pred)) == 1
    raise ValueError(f"unknown MatchAction {match_action!r}")


def property_path(path: str) -> Column:
    """Association/property traversal: the reference's XPath-style ``a/b/c``
    value references (F/filter/AssociationValue.java:1-289 cited path
    semantics) map directly onto Spark nested-struct access — ``a/b/c`` ->
    ``F.col("a.b.c")``.  A missing association anywhere on the path yields
    NULL (three-valued logic), matching the reference's empty-Optional
    propagation."""
    return F.col(path.replace("/", "."))
