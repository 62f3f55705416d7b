"""CDC old/new-image operators (reference D2/F5/F6, index.js:187-221).

The reference receives explicit before/after images per change record.
In the batch engine, the "old image" of a keyed stream is the previous
row for the same key in event-time order — `lag()` over a keyed window
reconstructs it (classic CDC-to-changelog transform). At scale this is
one shuffle on the key, identical to what any stateful reconstruction
would pay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def with_old_image(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Attach old_<col> columns carrying the previous value per key
    (null for the first change of a key — an INSERT in reference terms,
    index.js:146: eventName INSERT vs MODIFY)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    out = df
    for c in value_cols:
        out = out.withColumn(f"old_{c}", F.lag(c).over(w))
    return out.withColumn(
        "change_kind",
        F.when(F.lag(order_cols[0]).over(w).isNull(), F.lit("INSERT")).otherwise(
            F.lit("MODIFY")
        ),
    )


def pool_expansion_suppressed(new_k: F.Column, old_k: F.Column) -> F.Column:
    """F6 (index.js:210-221): MODIFY with new.newMatches = 0 while
    old.totalMatches > 0 is a no-op pool expansion -> suppress. NULL old
    image (INSERT) is never suppressed."""
    return F.coalesce((new_k == 0) & (old_k > 0), F.lit(False))
