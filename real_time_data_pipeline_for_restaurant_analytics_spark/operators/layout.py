"""Data-layout operators: Z-order (Morton) multi-dimensional
clustering for file-skipping at scale.

Parquet/ORC scans prune row groups by per-column min/max. Sorting by
ONE key gives tight min/max ranges for that key only; queries
filtering the OTHER key read everything. Interleaving the bits of
both keys into one Morton z-value and range-partitioning on it keeps
every bucket's min/max tight in EVERY interleaved dimension at once —
the standard lakehouse `OPTIMIZE ZORDER BY` layout, built here from
first principles as pure integer bit arithmetic:

    z = Σ_k ((x >> k) & 1) << 2k  |  Σ_k ((y >> k) & 1) << (2k+1)

Everything is map-side JVM integer ops inside whole-stage codegen (no
UDFs, no shuffle to compute z). The production write is
``df.repartitionByRange(N, "zvalue").sortWithinPartitions("zvalue")
.write...`` — at 100 TB that is exactly one range shuffle, the same
cost as any other sorted write, and every downstream scan with a
predicate on either key prunes ~√B of B buckets instead of reading
all of them.

The registered audit query buckets lineitem by the top z-bits and
reports per-bucket min/max spans of both keys — the measurable
file-skipping contract (tight spans ⇒ pruning works). The reference
has no multi-dim layout (Snowflake handles micro-partition pruning
internally, e.g. its date-pruned daily loads, `order_proc.sql`
data-path contract); this is the explicit Spark-side equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_BITS = 16  # bits kept per dimension; 2 dims → 32-bit z-value


def _interleave_expr(col: str, bits: int, offset: int) -> str:
    """SQL for spreading ``col``'s low ``bits`` bits to positions
    2k+offset. Disjoint bit positions ⇒ plain addition assembles the
    word (no OR chain needed)."""
    terms = [
        f"shiftleft(shiftright({col}, {k}) & 1, {2 * k + offset})" for k in range(bits)
    ]
    return " + ".join(terms)


def zorder_key(x_col: str, y_col: str, bits: int = _BITS) -> Column:
    """Morton z-value of two non-negative integer columns (low
    ``bits`` bits each). Pure codegen-friendly integer arithmetic,
    zero shuffles.

    Callers MUST pick ``bits`` >= ceil(log2(max(key)+1)) for their
    key range: high bits above ``bits`` are silently dropped, and a
    truncated dimension quietly loosens bucket locality (e.g.
    l_partkey exceeds 2^16 at sf >= ~0.5 — pass bits=ceil(log2(max
    partkey)) there, derived from the table stats at plan-build
    time). Truncation is engine-consistent (the DuckDB twin drops
    the same bits) so audits stay comparable either way."""
    return F.expr(
        f"{_interleave_expr(x_col, bits, 0)} + {_interleave_expr(y_col, bits, 1)}"
    ).cast("bigint")


#: Fixed interleave width for the stats-derived audit: terms above a
#: key's actual bit length are zero, so a 31-bit interleave yields the
#: IDENTICAL z-value for any narrower key (and 2x31+1 < 63 keeps the
#: z-word BIGINT-safe). Only the bucket SHIFT depends on the data.
_MAX_BITS = 31


def zorder_bits_stats(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """1-row frame with the per-dimension bit width the table actually
    needs: ``bits = max(bit_length(max(x)), bit_length(max(y)), 3)``
    (integer-exact via base-2 string length — no float log2 edge
    cases; floor 3 keeps the bucket shift non-negative). In production
    this comes from catalog column stats for free; computed here it is
    one column-pruned 2-column aggregate, riding back into the plan
    via the 1-row broadcast-cross house pattern — no driver collect.

    Clamped to ``_MAX_BITS`` = 31: the DuckDB twin interleaves at a
    fixed 31-bit width (terms above 31 dropped), so a key wider than
    31 bits must truncate IDENTICALLY on both engines — and 2x31+1
    bits is also the BIGINT-safety ceiling for the z-word itself."""
    return df.agg(
        F.least(
            F.expr(
                f"greatest(length(conv(max({x_col}), 10, 2)),"
                f" length(conv(max({y_col}), 10, 2)), 3)"
            ),
            F.lit(_MAX_BITS),
        )
        .cast("int")
        .alias("_bits")
    )


def zorder_bucket_audit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_bucket_bits: int = 6,
    bits: int | None = _BITS,
) -> DataFrame:
    """Bucket rows by the TOP ``n_bucket_bits`` of their z-value (the
    range-partitioning a z-ordered write would produce) and report
    each bucket's row count and min/max span of BOTH dimensions.

    Tight per-bucket spans in both x and y are the audit evidence the
    layout skips files for predicates on either key. One scan + one
    aggregation keyed by bucket (≤ 2^n_bucket_bits groups).

    ``bits=None`` derives the width from the table's own stats
    (:func:`zorder_bits_stats`), so a key outgrowing a hard-coded
    width (l_partkey > 2^16 at sf >= ~0.5) can neither be silently
    truncated nor collapse every row into bucket 0. The bucket is
    computed DIRECTLY as the interleave of each key's top
    ``n_bucket_bits/2`` bits (mathematically identical to the top
    ``n_bucket_bits`` of the full z-value, since interleaving
    commutes with taking top bits at equal widths) — 6 shift terms
    with a column shift amount instead of a full-width interleave
    plus shift, so the stats-derived path costs no more map-side
    work than the fixed-width one."""
    if bits is None:
        half = n_bucket_bits // 2
        assert n_bucket_bits == 2 * half, "n_bucket_bits must be even in stats mode"
        top_terms = " + ".join(
            f"shiftleft(shiftright({c}, _bits - {half - k}) & 1, {2 * k + off})"
            for k in range(half)
            for off, c in ((0, "x"), (1, "y"))
        )
        return (
            df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
            .crossJoin(F.broadcast(zorder_bits_stats(df, x_col, y_col)))
            .select(
                "x",
                "y",
                F.expr(f"CAST({top_terms} AS BIGINT)").alias("zbucket"),
            )
            .groupBy("zbucket")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.min("x").cast("bigint").alias("x_min"),
                F.max("x").cast("bigint").alias("x_max"),
                F.min("y").cast("bigint").alias("y_min"),
                F.max("y").cast("bigint").alias("y_max"),
            )
            .orderBy("zbucket")
        )
    z = zorder_key(x_col, y_col, bits)
    return (
        df.select(
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
            F.shiftright(z, 2 * bits - n_bucket_bits).cast("bigint").alias("zbucket"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("x").cast("bigint").alias("x_min"),
            F.max("x").cast("bigint").alias("x_max"),
            F.min("y").cast("bigint").alias("y_min"),
            F.max("y").cast("bigint").alias("y_max"),
        )
        .orderBy("zbucket")
    )


def _interleave_sql_duck(col: str, bits: int, offset: int) -> str:
    terms = [f"((({col} >> {k}) & 1) << {2 * k + offset})" for k in range(bits)]
    return " + ".join(terms)


# bits derived from the data on BOTH engines (base-2 string length =
# integer-exact bit_length); interleave at the fixed _MAX_BITS width,
# identical z-value for any actual key width — see zorder_bucket_audit
_ZORDER_ORACLE = f"""
WITH st AS (
  SELECT GREATEST(length(format('{{:b}}', MAX(l_partkey))),
                  length(format('{{:b}}', MAX(l_suppkey))), 3) AS bits
  FROM lineitem
), z AS (
  SELECT l_partkey AS x, l_suppkey AS y,
         ({_interleave_sql_duck("l_partkey", _MAX_BITS, 0)}
          + {_interleave_sql_duck("l_suppkey", _MAX_BITS, 1)}) AS zvalue
  FROM lineitem
)
SELECT CAST(zvalue >> (2 * st.bits - 6) AS BIGINT) AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(x) AS BIGINT) AS x_min, CAST(MAX(x) AS BIGINT) AS x_max,
       CAST(MIN(y) AS BIGINT) AS y_min, CAST(MAX(y) AS BIGINT) AS y_max
FROM z, st GROUP BY 1 ORDER BY zbucket
"""


@register(
    "q88_zorder_layout",
    oracle=_ZORDER_ORACLE,
    doc="Z-order (Morton) layout audit: interleave l_partkey/l_suppkey "
    "bits into a z-value, bucket by its top 6 bits, report per-bucket "
    "min/max spans of both keys — the multi-dimensional file-skipping "
    "contract a ZORDER BY write provides. Map-side integer bit ops, "
    "one small aggregation; bucket width derived from table stats on "
    "both engines so key growth can't truncate the layout.",
)
def q88_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return zorder_bucket_audit(li, "l_partkey", "l_suppkey", n_bucket_bits=6, bits=None)


# ---------------------------------------------------------------------------
# Small-file compaction planner (the lakehouse OPTIMIZE / bin-packing
# shape). The reference never needs one — Snowflake repacks
# micro-partitions internally after every COPY (its daily date-path
# loads, `order_proc.sql`, lean on that service) — but a Spark
# warehouse ingesting the same daily drops accumulates small files,
# and at 100 TB the planner that groups them into ~target-sized
# rewrites IS the maintenance operator.
# ---------------------------------------------------------------------------
def compaction_assignments(
    files: DataFrame,
    group_col: str,
    order_col: str,
    size_col: str,
    target_bytes: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-file next-fit group assignment — the shared kernel of the
    PLAN view (:func:`compaction_plan`, q137) and the EXECUTOR
    (:func:`compact_files`): one row per file with its output group
    ``floor(running-start-offset / target)``. Extra input columns ride
    through untouched (the executor threads the file path).

    Determinism: a ROWS running sum over a NON-unique ``order_col``
    depends on how Spark happens to order peer rows, so the packing
    would differ run-to-run (and from the oracle) whenever same-keyed
    files have unequal sizes. Pass ``tiebreak_col`` (any unique
    column, e.g. the file name) when ``order_col`` can repeat — e.g.
    ordering by mtime or size; q137's doc_id and the executor's fid
    are unique, so they omit it."""
    # ROWS frame, not the default RANGE frame: RANGE includes peer
    # rows with equal order_col values in the running sum, which would
    # inflate start offsets (and diverge from next-fit semantics and
    # the oracle's ROWS UNBOUNDED PRECEDING) whenever the order key
    # has duplicates — e.g. ordering by mtime or size instead of a
    # unique file id.
    order_by = [order_col] if tiebreak_col is None else [order_col, tiebreak_col]
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    passthrough = [
        c for c in files.columns if c not in (group_col, order_col, size_col)
    ]
    start = (F.sum(F.col(size_col)).over(w) - F.col(size_col)).alias("start_off")
    return files.select(
        F.col(group_col).alias("part"),
        F.col(order_col).alias("fid"),
        F.col(size_col).alias("sz"),
        *passthrough,
        start,
    ).select(
        "part",
        "fid",
        "sz",
        *passthrough,
        # integer `div`, not `/`: float division would round-trip
        # through a double and drift from the oracle's exact `//`
        # once a partition's byte total passes 2^53
        F.expr(f"start_off div {int(target_bytes)}").cast("bigint").alias("out_group"),
    )


def compaction_plan(
    files: DataFrame,
    group_col: str,
    order_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Sequential (next-fit) bin-packing of files into output groups
    of ~``target_bytes``: within each ``group_col`` (table partition),
    files ordered by ``order_col`` are assigned to output group
    ``floor(start_offset / target_bytes)`` where start_offset is the
    running byte total BEFORE the file — the standard compaction
    binning (every group except possibly the last spans >= target
    bytes once its last file lands, and order is preserved so the
    rewrite stays a sequential scan of its inputs).

    Scale: this plans over FILE METADATA, one row per file — at
    100 TB with 128 MB files that is ~800k rows, kilobytes per
    partition on the shuffle. The per-partition window is the
    sequential-packing semantics itself (order-dependent by
    definition); partitions are independent, so the sort parallelizes
    across them, and a partition's listing is never larger than its
    file count. Output: one row per planned output group with file
    count, byte total, the id span it covers, and an `undersized`
    flag (< target/2 — the trailing remainder a caller may defer to
    the next run).
    """
    return (
        compaction_assignments(files, group_col, order_col, size_col, target_bytes)
        .groupBy("part", "out_group")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("sz").cast("bigint").alias("group_bytes"),
            F.min("fid").cast("bigint").alias("first_id"),
            F.max("fid").cast("bigint").alias("last_id"),
        )
        .withColumn(
            "undersized",
            (F.col("group_bytes") < F.lit(target_bytes // 2)).cast("boolean"),
        )
        .orderBy("part", "out_group")
    )


def compact_files(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int,
) -> dict:
    """EXECUTE a compaction: rewrite ``src_dir``'s small parquet files
    into ``dst_dir`` as one file per planned output group of
    ~``target_bytes`` — the OPTIMIZE half that q137 only plans. The
    maintenance loop the reference gets from Snowflake's automatic
    micro-partition repacking after each daily COPY
    (`order_proc.sql`'s loads); a Spark warehouse runs this instead.

    Shape, sized for 100 TB:

    1. one driver-side METADATA listing of the source files (path,
       size) — the same ~800k-rows-at-100-TB bound q137 documents;
    2. the shared next-fit assignment kernel maps file → output group
       (:func:`compaction_assignments` — identical arithmetic to the
       plan view, so what executes IS what q137 predicted);
    3. ONE scan of the data, tagged by ``input_file_name()``, joined
       to the broadcast file→group map (file-count-sized, never
       data-sized);
    4. one shuffle keyed by output group, written
       ``partitionBy(out_group)`` — exactly one file per group dir
       (rows for a group land in one task), total shuffle volume =
       the rewrite volume, nothing more;
    5. a metadata-only row-count audit (parquet footer counts, no
       data read) of src vs dst — a listing/tag mismatch (nested
       dirs, exotic names) fails LOUDLY instead of silently dropping
       rows through the inner join.

    PARTITIONED layouts (round-8, verdict item 3): when ``src_dir``
    holds hive partition dirs (``col=value/``, the form a real
    lakehouse OPTIMIZE walks), each partition packs INDEPENDENTLY with
    the same shared kernel (group_col = the partition dir), the
    rewrite preserves the partition layout
    (``dst/col=value/out_group=g/`` with exactly one file per leaf),
    the row-count audit runs PER PARTITION, and the executor consumes
    the planner's own assignment frame — what executes IS what q137's
    kernel computed, structurally. See :func:`_compact_partitioned`.

    Returns {files_in, groups_out, bytes_in, rows} for the caller's
    audit (+ {partitions, plan_rows} for partitioned sources).
    Ordering note: row order within a group is not preserved (parquet
    rewrite, same as any OPTIMIZE); content equality is set-equality,
    pinned by the round-trip test.
    """
    import os

    part_dirs = sorted(
        e
        for e in os.listdir(src_dir)
        if "=" in e and os.path.isdir(os.path.join(src_dir, e))
    )
    if part_dirs:
        return _compact_partitioned(spark, src_dir, dst_dir, target_bytes, part_dirs)

    listing = sorted(
        (f, os.path.getsize(os.path.join(src_dir, f)))
        for f in os.listdir(src_dir)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    files = spark.createDataFrame(
        [(name, i, sz) for i, (name, sz) in enumerate(listing)],
        "fname string, fid long, sz long",
    ).withColumn("part", F.lit("t"))
    assign = compaction_assignments(files, "part", "fid", "sz", target_bytes).select(
        "fname", "out_group"
    )
    # input_file_name() reports the file URI, which percent-encodes
    # characters like spaces — decode the basename back to the
    # os.listdir spelling so the join key matches the listing
    # (see _uri_basename for the '+'-escaping subtlety).
    data = spark.read.parquet(src_dir).withColumn(
        "_fname",
        _uri_basename(F.element_at(F.split(F.input_file_name(), "/"), -1)),
    )
    # distinct-group COUNT, not max+1: next-fit group ids skip
    # integers whenever a single file is >= target_bytes, and the
    # skipped ids would inflate the stat and create empty partitions
    groups = sorted(r[0] for r in assign.select("out_group").distinct().collect())
    n_groups = len(groups)
    (
        data.join(F.broadcast(assign), data["_fname"] == assign["fname"])
        .drop("_fname", "fname")
        .repartition(max(n_groups, 1), "out_group")
        .write.mode("overwrite")
        .partitionBy("out_group")
        .parquet(dst_dir)
    )
    n_src = spark.read.parquet(src_dir).count()
    n_dst = spark.read.parquet(dst_dir).count() if n_src else 0
    if n_dst != n_src:
        raise RuntimeError(
            f"compact_files: rewrote {n_dst} of {n_src} source rows — a "
            "source file's tagged name did not match the directory "
            f"listing (nested dirs under {src_dir!r}?). The destination "
            f"{dst_dir!r} is incomplete; the source is untouched."
        )
    return {
        "files_in": len(listing),
        "groups_out": n_groups,
        "bytes_in": sum(sz for _, sz in listing),
        "rows": int(n_src),
    }


def _uri_basename(segment: Column) -> Column:
    """Decode one ``input_file_name()`` URI path segment back to its
    on-disk spelling. url_decode is form-encoding (it would turn a
    literal '+' into a space); a URI path never holds a raw space, so
    any '+' is a real plus — escape it to %2B first, then decode the
    %XX escapes."""
    return F.url_decode(F.replace(segment, F.lit("+"), F.lit("%2B")))


def _compact_partitioned(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int,
    part_dirs: list[str],
) -> dict:
    """Partition-aware executor half of :func:`compact_files`:

    1. walk each ``col=value/`` dir, listing (partition dir, file,
       size) — still file-METADATA-sized;
    2. the SAME next-fit kernel packs per partition (group_col = the
       partition dir name); the executor consumes the planner's own
       assignment frame, so the planner/executor contract is
       structural — q137's plan view is this frame aggregated;
    3. ONE scan of the whole partitioned table, tagged with the
       decoded ``<part dir>/<basename>`` of ``input_file_name()``,
       joined to the broadcast file→group map;
    4. one shuffle keyed by (partition value, out_group) written
       ``partitionBy(pcol, out_group)`` — exactly one file per
       partition-group leaf; Spark re-infers the partition column on
       read, so value typing and dir-name escaping round-trip through
       its own partition codec rather than hand-parsed strings;
    5. the metadata-only row audit runs PER PARTITION (a groupBy on
       the partition column reads no data columns), so a mismatch
       names the torn partition instead of a corpus-level count.
    """
    import os

    pcol = part_dirs[0].split("=", 1)[0]
    mixed = [e for e in part_dirs if e.split("=", 1)[0] != pcol]
    if mixed:
        raise ValueError(
            f"compact_files: partition dirs under {src_dir!r} mix column "
            f"names ({part_dirs[0]!r} vs {mixed[0]!r}) — one partition "
            "level with one column is supported."
        )
    if pcol in ("out_group", "fkey", "_fkey"):
        # a source partitioned by one of the kernel's internal column
        # names (notably a previous compact_files OUTPUT, partitioned
        # by out_group) would collide with the assignment columns and
        # die in an opaque duplicate-column AnalysisException — refuse
        # with the real reason instead. To re-OPTIMIZE a compacted
        # table, rewrite it under a different partition column first
        # (out_group is a compaction artifact, not a table partition).
        raise ValueError(
            f"compact_files: partition column {pcol!r} collides with the "
            "compaction kernel's internal columns (out_group/fkey/_fkey "
            "are reserved); rename the partition column to compact this "
            "layout."
        )
    listing = []
    for pd in part_dirs:
        d = os.path.join(src_dir, pd)
        for f in sorted(os.listdir(d)):
            if os.path.isdir(os.path.join(d, f)):
                raise ValueError(
                    f"compact_files: nested directory {pd}/{f} under "
                    f"{src_dir!r} — only one partition level is supported "
                    "(deeper trees would silently escape the listing)."
                )
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                listing.append((pd, f, os.path.getsize(os.path.join(d, f))))
    if not listing:
        # nothing to compact (empty partition dirs) — a scan of zero
        # files can't even infer a schema, so return clean zero stats
        return {
            "files_in": 0,
            "groups_out": 0,
            "bytes_in": 0,
            "rows": 0,
            "partitions": len(part_dirs),
        }
    files = spark.createDataFrame(
        [(pd, f, i, sz) for i, (pd, f, sz) in enumerate(listing)],
        "pdir string, fname string, fid long, sz long",
    )
    assign = compaction_assignments(files, "pdir", "fid", "sz", target_bytes)
    amap = assign.select(
        F.concat_ws("/", "part", "fname").alias("fkey"), "out_group"
    )
    # the executor consumes the PLANNER'S OWN assignment frame (the
    # same kernel q137's plan view aggregates), so the planner/executor
    # contract is structural, not an assertable invariant — one bounded
    # job (file-count rows) lists the groups to be written
    groups = assign.select("part", "out_group").distinct().collect()
    n_groups = len(groups)
    uri = F.split(F.input_file_name(), "/")
    data = spark.read.parquet(src_dir).withColumn(
        "_fkey",
        F.concat_ws(
            "/", _uri_basename(F.element_at(uri, -2)), _uri_basename(F.element_at(uri, -1))
        ),
    )
    (
        data.join(F.broadcast(amap), data["_fkey"] == amap["fkey"])
        .drop("_fkey", "fkey")
        .repartition(max(n_groups, 1), F.col(pcol), F.col("out_group"))
        .write.mode("overwrite")
        .partitionBy(pcol, "out_group")
        .parquet(dst_dir)
    )
    src_counts = {
        r[0]: r[1]
        for r in spark.read.parquet(src_dir).groupBy(pcol).count().collect()
    }
    # zero-row sources write no partition dirs at all — reading dst
    # would die on schema inference instead of auditing clean (the
    # flat path's `if n_src` guard, kept here per-partition)
    dst_counts = (
        {
            r[0]: r[1]
            for r in spark.read.parquet(dst_dir).groupBy(pcol).count().collect()
        }
        if sum(src_counts.values())
        else {}
    )
    if src_counts != dst_counts:
        torn = sorted(
            str(k)
            for k in set(src_counts) | set(dst_counts)
            if src_counts.get(k) != dst_counts.get(k)
        )
        raise RuntimeError(
            f"compact_files: per-partition row audit failed for "
            f"{pcol} in {torn[:5]} (src={ {k: src_counts.get(k) for k in torn[:5]} }, "
            f"dst={ {k: dst_counts.get(k) for k in torn[:5]} }) — a source "
            "file's tagged name did not match the directory listing. The "
            f"destination {dst_dir!r} is incomplete; the source is untouched."
        )
    return {
        "files_in": len(listing),
        "groups_out": n_groups,
        "bytes_in": sum(sz for _, _, sz in listing),
        "rows": int(sum(src_counts.values())),
        "partitions": len(part_dirs),
    }


_COMPACTION_TARGET = 2048  # bytes per output group at gate scale

_COMPACTION_ORACLE = f"""
WITH f AS (
  SELECT source AS part, doc_id AS fid, n_chars AS sz,
         SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - n_chars AS start_off
  FROM documents
)
SELECT part, CAST(start_off // {_COMPACTION_TARGET} AS BIGINT) AS out_group,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(sz) AS BIGINT) AS group_bytes,
       CAST(MIN(fid) AS BIGINT) AS first_id,
       CAST(MAX(fid) AS BIGINT) AS last_id,
       SUM(sz) < {_COMPACTION_TARGET} // 2 AS undersized
FROM f GROUP BY 1, 2 ORDER BY part, out_group
"""


@register(
    "q137_compaction_plan",
    oracle=_COMPACTION_ORACLE,
    doc="Small-file compaction planner (lakehouse OPTIMIZE bin-packing): "
    "per table partition, files ordered by id are packed next-fit into "
    "~target-byte output groups by floor(running-start-offset / target) "
    "— one row per planned rewrite group with file count, bytes, id "
    "span, and an undersized flag for the trailing remainder. Plans "
    "over file METADATA (one row per file): at 100 TB ~800k rows, so "
    "the per-partition packing window costs kilobytes per partition.",
)
def q137_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return compaction_plan(d, "source", "doc_id", "n_chars", _COMPACTION_TARGET)
