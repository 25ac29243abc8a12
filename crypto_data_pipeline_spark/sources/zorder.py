"""Z-order (Morton-curve) clustered layout for multi-dimensional file
pruning.

Range-clustering a table on ONE column (sources/compaction.py) makes
parquet footer min/max stats selective for that column only; a 100 TB
table queried by BOTH user and time (or key and value) needs its files
clustered on a space-filling curve so a range predicate on EITHER
dimension overlaps a small fraction of files. This is the layout trick
behind Delta/Iceberg OPTIMIZE ZORDER BY, built here from first
principles as pure codegen expressions:

  1. each dimension is quantized to a 2^bits-bucket rank with one
     closed-form double expression (no sort, no window);
  2. bucket bits are interleaved into the Morton z-value — an unrolled
     shift/mask OR-chain, fully inside whole-stage codegen;
  3. the write repartitions BY RANGE on the z-value and sorts within
     partitions, so every output file covers a compact z-range — i.e.
     a small hyper-rectangle of the (x, y) space — and its footer
     min/max on the ORIGINAL columns is tight on both.

The quantizer needs each dimension's (min, max); they ride in via one
1-row aggregate joined broadcast-style (a single extra stage, no
driver collect), so the whole layout job is scan → agg → z-map →
range-shuffle → write at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bucketize(col: Column, cmin: Column, cmax: Column, bits: int = 16) -> Column:
    """Equi-width quantization of ``col`` into [0, 2^bits) as a single
    IEEE-double expression — bit-identical across engines (the DuckDB
    oracle mirrors it verbatim)."""
    n = 1 << bits
    raw = F.floor(
        (col.cast("double") - cmin.cast("double"))
        / (cmax.cast("double") - cmin.cast("double") + 1e-9)
        * n
    ).cast("long")
    return F.least(F.greatest(raw, F.lit(0).cast("long")), F.lit(n - 1).cast("long"))


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of two ``bits``-bit bucket ids: bit i of x
    lands at position 2i, bit i of y at 2i+1. Unrolled shift/mask OR
    chain — 4·bits leaf ops, all codegen, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        z = z.bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def with_zvalue(
    df: DataFrame, xcol: str, ycol: str, bits: int = 16, out: str = "_z"
) -> DataFrame:
    """Attach the z-value of (xcol, ycol). The per-dimension (min, max)
    ride in via a broadcast 1-row aggregate — no driver round-trip."""
    bounds = df.agg(
        F.min(xcol).alias("_xmin"),
        F.max(xcol).alias("_xmax"),
        F.min(ycol).alias("_ymin"),
        F.max(ycol).alias("_ymax"),
    )
    with_b = df.crossJoin(F.broadcast(bounds))
    zx = bucketize(F.col(xcol), F.col("_xmin"), F.col("_xmax"), bits)
    zy = bucketize(F.col(ycol), F.col("_ymin"), F.col("_ymax"), bits)
    return with_b.withColumn(out, zvalue(zx, zy, bits)).drop(
        "_xmin", "_xmax", "_ymin", "_ymax"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    n_files: int = 16,
    bits: int = 16,
) -> DataFrame:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    z-order curve of (xcol, ycol), so footer min/max stats prune files
    for range predicates on either column. Returns the re-read frame."""
    spark = df.sparkSession
    (
        with_zvalue(df, xcol, ycol, bits)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return spark.read.parquet(path)
