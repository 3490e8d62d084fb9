"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB the cheapest query is the one that never reads the file: a
range predicate prunes Parquet files/row-groups via their min/max
footer stats, but a table sorted on ONE column has useless stats for
every OTHER column. Interleaving the bits of several columns into one
Z-VALUE and range-partitioning + sorting on it gives every
participating column locally-narrow min/max ranges per file, so
predicates on ANY of them skip most of the table (the technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY`` — public; Morton 1966).

Everything here is Column algebra over int64 (shifts + masks, the
classic bit-spreading sequence) — whole-stage codegen, no UDFs, and
the identical arithmetic runs on any ANSI engine, which is what makes
the DuckDB oracle exact.

Scale notes:
- ``zorder_layout`` is one repartitionByRange (a range shuffle with a
  sampled-boundaries pass, Spark's standard total-order machinery) +
  an in-partition sort — the same cost as any global sort-write.
- Interleaving caps each dimension at ``bits`` low-order bits
  (default 16). Callers with wider domains should first rank/bucket
  the column (e.g. ``F.ntile`` or quantile bucketing) — stats-based
  skipping only needs MONOTONIC bucketing, not exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (shift, mask) pairs spreading a 16-bit value so its bits occupy even
# positions of a 32-bit lane: the classic Morton magic-number sequence
_SPREAD_16 = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread_bits(col, bits: int):
    """Spread the low ``bits`` bits of ``col`` so bit i lands at
    position 2i (bits ≤ 16: 32-bit lanes suffice)."""
    x = col.bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in _SPREAD_16:
        x = (
            x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
        )
    return x


def zorder_key(col_a, col_b, bits: int = 16):
    """Morton-interleave the low ``bits`` bits of two integer columns
    into one int64 Z-value: ``a``'s bits at even positions, ``b``'s at
    odd. Pure shifts/masks — the SQL twin is the same expression."""
    a = _spread_bits(col_a.cast("long"), bits)
    b = _spread_bits(col_b.cast("long"), bits)
    return a.bitwiseOR(F.shiftleft(b, 1)).cast("long")


def zorder_key_sql(col_a: str, col_b: str, bits: int = 16) -> str:
    """ANSI-SQL twin of :func:`zorder_key` (DuckDB oracle)."""

    def spread(col: str) -> str:
        x = f"({col} & {(1 << bits) - 1})"
        for shift, mask in _SPREAD_16:
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    return f"({spread(col_a)} | ({spread(col_b)} << 1))"


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    num_files: int = 64,
    bits: int = 16,
    z_col: str = "_z",
) -> DataFrame:
    """Cluster ``df`` for two-dimensional file skipping: compute the
    Z-value, range-partition into ``num_files`` partitions on it, and
    sort within each — written out, every file covers a compact Z-range
    and therefore a narrow min/max box in BOTH columns. Drop ``z_col``
    after writing if the consumer doesn't want it persisted."""
    return (
        df.withColumn(z_col, zorder_key(F.col(col_a), F.col(col_b), bits))
        .repartitionByRange(num_files, F.col(z_col))
        .sortWithinPartitions(z_col)
    )


def zorder_long_expr(df: DataFrame, col: str):
    """Integer view of a z-order dimension column: timestamps map to
    unix micros (monotonic), numerics cast to long. Strings/maps are
    rejected — parquet footer stats can't range-prune them through a
    hash, so z-ordering them would claim skipping it cannot deliver."""
    dt = dict(df.dtypes).get(col)
    if dt is None:
        raise ValueError(f"zorder column '{col}' not in {df.columns}")
    if dt.startswith("timestamp"):
        return F.unix_micros(F.col(col))
    if dt in ("bigint", "int", "smallint", "tinyint", "long", "date",
              "double", "float", "decimal") or dt.startswith("decimal"):
        return F.col(col).cast("long")
    raise ValueError(
        f"zorder column '{col}' has type {dt}; z-order needs an "
        "integer-castable or timestamp column (bucket/rank other types "
        "monotonically first)"
    )


def zorder_within_partitions(
    df: DataFrame,
    partition_col: str,
    col_a: str,
    col_b: str,
    num_files: int = 64,
    bits: int = 16,
) -> DataFrame:
    """Z-cluster a table that is ALSO dir-partitioned (the collection
    layout: partitionBy(_pb)): range-partition on (partition_col,
    z-value) and sort within tasks, so each output file inside every
    partition directory covers a compact Z-range — narrow min/max boxes
    in both dimensions, composing with the _pb update pruning. The
    Z-value interleaves the low ``bits`` bits of each column's integer
    view (zorder_long_expr); callers with wider domains should bucket
    monotonically first (module docstring)."""
    z = zorder_key(
        zorder_long_expr(df, col_a), zorder_long_expr(df, col_b), bits
    )
    return (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, F.col(partition_col), F.col("_z"))
        .sortWithinPartitions(partition_col, "_z")
        .drop("_z")
    )


def file_minmax_overlap_fraction(
    path: str,
    col_a: str,
    lo_a: int,
    hi_a: int,
    col_b: str,
    lo_b: int,
    hi_b: int,
) -> float:
    """Fraction of the layout's parquet files whose footer min/max box
    OVERLAPS the rectangle [lo_a, hi_a] × [lo_b, hi_b] — i.e. the files
    a stats-pruning scan must read. Driver-side footer inspection
    (pyarrow), used by tests/benchmarks to quantify skipping; the
    query path itself just relies on the engine's native pruning."""
    from pathlib import Path

    import pyarrow.parquet as pq

    files = sorted(Path(path).rglob("*.parquet"))
    if not files:
        return 1.0
    hit = 0
    for f in files:
        md = pq.ParquetFile(str(f)).metadata
        schema_names = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.num_columns)
        }
        mins: dict[str, int] = {}
        maxs: dict[str, int] = {}
        must_read = False
        for rg in range(md.num_row_groups):
            for name in (col_a, col_b):
                st = md.row_group(rg).column(schema_names[name]).statistics
                if st is None or not st.has_min_max:
                    # stats disabled/absent for this column: the engine
                    # cannot prune the file either — count it as a hit
                    must_read = True
                    break
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
            if must_read:
                break
        if must_read or (
            mins[col_a] <= hi_a and maxs[col_a] >= lo_a
            and mins[col_b] <= hi_b and maxs[col_b] >= lo_b
        ):
            hit += 1
    return hit / len(files)


def write_bucketed(
    df: DataFrame,
    spark,
    table_name: str,
    bucket_col: str,
    num_buckets: int,
    path: str,
    sort_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Persist ``df`` as a Spark BUCKETED table: rows hash-assigned to
    ``num_buckets`` files by ``bucket_col``, the bucket spec recorded
    in the catalog. Two tables bucketed the same way on their join key
    then join with ZERO Exchange — the scan itself satisfies the
    join's distribution requirement, so a 100 TB fact⋈fact join skips
    both shuffles entirely (the reason warehouses pre-bucket their
    biggest joins; SMB join in Hive terms). Complements zorder_layout:
    Z-order buys file SKIPPING for range predicates, bucketing buys
    shuffle-FREE equi-joins.

    The input is repartitioned onto its bucket assignment first so
    each bucket lands as ONE file per write (no small-file spray, and
    single-file buckets keep the sorted-scan optimization available
    when ``sort_cols`` start with the bucket column).

    ``path`` makes the table external (data where the caller says,
    catalog entry disposable); an existing entry is dropped first so
    re-writes relocate cleanly. Returns the freshly-registered table.
    """
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = (
        df.repartition(num_buckets, F.col(bucket_col))
        .write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
    return spark.table(table_name)
