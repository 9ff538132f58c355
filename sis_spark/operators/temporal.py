"""Allen-interval temporal predicates — the reference's 14 temporal filters
(F/filter/TemporalFilter.java + TemporalOperation.java:822, factory sites
DefaultFilterFactory.java:677-851) as Column builders.

Operands are instants (a single timestamp Column) or periods (begin, end
Column pair, half-open convention documented per predicate).  The reference
compares instants and periods by lifting an instant t to the degenerate
period [t, t]; ``lift`` does the same.
"""

from __future__ import annotations

from pyspark.sql import Column


def lift(begin: Column, end: Column | None = None) -> tuple[Column, Column]:
    """Instant -> degenerate period (TemporalOperation's instant lifting)."""
    return (begin, begin if end is None else end)


# self = (b1, e1), other = (b2, e2); all comparisons null-safe under WHERE
# (a null operand yields null -> row drops, matching ComparisonFilter's
# null => false rule, F/filter/ComparisonFilter.java:40-43)

def t_after(b1, e1, b2, e2) -> Column:
    return b1 > e2


def t_before(b1, e1, b2, e2) -> Column:
    return e1 < b2


def t_equals(b1, e1, b2, e2) -> Column:
    return (b1 == b2) & (e1 == e2)


def t_begins(b1, e1, b2, e2) -> Column:
    """self begins other: same start, ends earlier."""
    return (b1 == b2) & (e1 < e2)


def t_begun_by(b1, e1, b2, e2) -> Column:
    return (b1 == b2) & (e1 > e2)


def t_ends(b1, e1, b2, e2) -> Column:
    return (e1 == e2) & (b1 > b2)


def t_ended_by(b1, e1, b2, e2) -> Column:
    return (e1 == e2) & (b1 < b2)


def t_during(b1, e1, b2, e2) -> Column:
    return (b1 > b2) & (e1 < e2)


def t_contains(b1, e1, b2, e2) -> Column:
    return (b1 < b2) & (e1 > e2)


def t_meets(b1, e1, b2, e2) -> Column:
    return e1 == b2


def t_met_by(b1, e1, b2, e2) -> Column:
    return b1 == e2


def t_overlaps(b1, e1, b2, e2) -> Column:
    """Strict Allen overlaps: starts before, ends inside."""
    return (b1 < b2) & (e1 > b2) & (e1 < e2)


def t_overlapped_by(b1, e1, b2, e2) -> Column:
    return (b1 > b2) & (b1 < e2) & (e1 > e2)


def t_any_interacts(b1, e1, b2, e2) -> Column:
    """anyInteracts: the intervals share at least one instant."""
    return (b1 <= e2) & (e1 >= b2)


ALLEN = {
    "after": t_after, "before": t_before, "tequals": t_equals,
    "begins": t_begins, "begunBy": t_begun_by, "ends": t_ends,
    "endedBy": t_ended_by, "during": t_during, "tcontains": t_contains,
    "meets": t_meets, "metBy": t_met_by, "toverlaps": t_overlaps,
    "overlappedBy": t_overlapped_by, "anyInteracts": t_any_interacts,
}
