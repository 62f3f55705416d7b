"""Predicate builders with the reference's null semantics.

The reference uses JS optional chaining — a predicate over a missing
field is falsy, and negated checks therefore PASS nulls
(index.js:167-184: `!(status === 'sent' || sent === true)` lets
null/undefined through). SQL three-valued logic would instead drop the
row, so every negated filter here is wrapped to make the null behavior
explicit.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column, functions as F

# F8 (index.js:400-403): the reference's email regex, verbatim.
EMAIL_REGEX = r"^[^\s@]+@[^\s@]+\.[^\s@]+$"


def null_pass_not_any(*conds: Column) -> Column:
    """NOT(c1 OR c2 OR ...), where NULL conditions count as false —
    i.e. rows with nulls PASS, matching `!(a?.x === v)` JS semantics
    (index.js:167-174)."""
    return ~F.coalesce(reduce(or_, conds), F.lit(False))


def is_valid_email(col: Column) -> Column:
    """F8 email regex validation (index.js:400-403)."""
    return col.rlike(EMAIL_REGEX)


def is_blocklisted_email(col: Column) -> Column:
    """F10 blocklist: example.com / test.com domains or unknown@ prefix
    (index.js:433-439). Case-normalized first (P3, index.js:117)."""
    lowered = F.lower(col)
    return (
        lowered.contains("example.com")
        | lowered.contains("test.com")
        | lowered.startswith("unknown@")
    )
