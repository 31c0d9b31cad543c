"""Z-order (Morton) clustering values — multi-column data skipping.

Sorting a layout by ONE column gives min/max pruning on that column and
nothing on the others (their per-file ranges stay full-width). Interleaving
the bits of several columns' quantized codes into one Morton value and
sorting by THAT makes every file cover a small hyper-rectangle — per-file
min/max footer statistics become narrow on EVERY z-ordered column, so scans
filtered on any of them skip most row groups. This is Delta/Iceberg's
OPTIMIZE ZORDER, built from plain column expressions.

Quantization is linear against the column's global [min, max] (one tiny
aggregate per call — at 100 TB this is a metadata-cheap scan of the
columns being clustered, amortized into the compaction that uses it).
Numeric columns only; a constant column contributes zero information and
is coded 0. All arithmetic is JVM-side expressions — no UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, Column]:
    """Returns (df, zcol) where `zcol` is the Morton interleave of the
    columns' `bits`-bit linear quantization codes. Use directly in
    repartitionByRange/sortWithinPartitions; total width = bits×len(cols)
    ≤ 63 required (long arithmetic)."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_value needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds a long (≤ 63)")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).first()
    top = (1 << bits) - 1
    codes = []
    for i, c in enumerate(cols):
        lo, hi = stats[f"lo_{i}"], stats[f"hi_{i}"]
        if lo is None or hi is None or hi <= lo:
            codes.append(F.lit(0).cast("long"))  # constant/empty: no info
            continue
        scaled = (F.col(c).cast("double") - F.lit(lo)) / F.lit(hi - lo) * top
        codes.append(
            F.least(F.greatest(F.floor(scaled), F.lit(0)), F.lit(top)).cast("long")
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, code in enumerate(codes):
            bit = F.shiftright(code, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return df, z
