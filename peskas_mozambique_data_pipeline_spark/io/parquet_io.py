"""Versioned Parquet zone I/O.

The reference hands data between pipeline stages as versioned Parquet
files on GCS named ``{prefix}__{timestamp}_{gitsha}__.parquet``
(R/utils.R:30-52; writes at R/ingestion.R:61-66, reads at
R/preprocessing-surveys.R:69-74).  Here a *zone* is a directory of
versioned subdirectories; ``read_latest`` resolves the newest version.

Scale posture: curated zones are written partitioned (by e.g.
``landing_month``) so downstream jobs get partition pruning; version
resolution stays a driver-side directory listing (metadata only).
"""

from __future__ import annotations

import os
import re
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

VERSION_RE = re.compile(r"__(\d{14})_([0-9a-zA-Z]+)__$")


def versioned_name(prefix: str, git_sha: str = "local", now: datetime | None = None) -> str:
    ts = (now or datetime.now(timezone.utc)).strftime("%Y%m%d%H%M%S")
    return f"{prefix}__{ts}_{git_sha}__"


def write_versioned(
    df: DataFrame,
    zone_dir: str,
    prefix: str,
    git_sha: str = "local",
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    range_by: list[str] | None = None,
    n_files: int | None = None,
    compression: str = "lz4",
    bloom_cols: list[str] | None = None,
    manifest: bool = False,
    skipping_cols: list[str] | None = None,
    now: datetime | None = None,
) -> str:
    """Write an immutable versioned snapshot into ``zone_dir``.

    ``now`` pins the version stamp (backfills / reproducible tests);
    default is wall-clock UTC.

    lz4 matches the reference's codec choice (R/api.R:133-138).
    ``sort_by`` sorts within output files so parquet row-group min/max
    statistics become selective — downstream range predicates on those
    columns skip row groups entirely (the cheap cousin of Z-ordering).
    ``range_by`` additionally range-partitions ACROSS files first
    (globally disjoint per-file key ranges — file-level pruning, not
    just row-group-level); ``n_files`` bounds the file count.
    ``bloom_cols`` writes parquet BLOOM FILTERS for the named columns:
    min/max zone maps prune RANGE predicates, but point lookups on
    high-cardinality keys that are NOT the sort order (url digests,
    content hashes) sail past min/max — a bloom filter rejects
    row groups for ``key = v`` probes at ~1% false-positive cost,
    which at 100 TB is the difference between scanning a zone and
    touching a handful of row groups.  Spark's parquet writer and
    reader both honor them natively (reader: spark.sql.parquet
    filterPushdown, on by default).
    Returns the written path.

    The version timestamp is second-resolution, so two same-prefix
    same-sha writes within one second (back-to-back compactions in a
    test, a retry loop) would collide on the immutable path — probe
    for an unused name by extending the sha segment (format every
    loader parses is preserved; lexicographic version order puts the
    suffixed name after the bare one, i.e. newest-last, correctly).
    """
    name = versioned_name(prefix, git_sha, now)
    n = 0
    while os.path.exists(os.path.join(zone_dir, name)):
        n += 1
        name = versioned_name(prefix, f"{git_sha}u{n}", now)
    path = os.path.join(zone_dir, name)
    if range_by:
        # write_sorted's layout inside the versioned zone: files form
        # disjoint key ranges (file i's max ≤ file i+1's min), so
        # downstream range predicates on these columns prune whole
        # files via parquet zone maps — one sampled range-exchange at
        # write time, no single-task global sort
        df = (
            df.repartitionByRange(n_files, *range_by)
            if n_files
            else df.repartitionByRange(*range_by)
        )
        df = df.sortWithinPartitions(*range_by)
    elif sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode("errorifexists").option("compression", compression)
    for c in bloom_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    if manifest:
        # integrity sidecar inside the version dir: underscore-prefixed,
        # so every parquet reader of ``path`` ignores it.  Opt-in — it
        # costs one read-back scan of the snapshot, which a release
        # build pays and a hot intermediate zone doesn't.
        zone_manifest(df.sparkSession, path).coalesce(1).write.parquet(
            os.path.join(path, "_manifest")
        )
    if skipping_cols:
        # file-level min/max zone map next to the snapshot — the
        # reader-side half of the sort_by/range_by/zorder layout work:
        # read_pruned consults this #files-row table instead of
        # listing a million parquet footers (io/skipping.py)
        from .skipping import write_skipping_index

        write_skipping_index(df.sparkSession, path, list(skipping_cols))
    return path


def latest_version_path(zone_dir: str, prefix: str) -> str:
    """Resolve the newest versioned snapshot for ``prefix``."""
    candidates = []
    for name in os.listdir(zone_dir):
        # match on the full "prefix__" stem so a zone holding both
        # "trips" and "trips_extra" never resolves the wrong dataset
        if not name.startswith(prefix + "__"):
            continue
        m = VERSION_RE.search(name)
        if m:
            candidates.append((m.group(1), name))
    if not candidates:
        raise FileNotFoundError(f"no versioned dataset for prefix={prefix!r} in {zone_dir}")
    _, newest = max(candidates)
    return os.path.join(zone_dir, newest)


def read_latest(spark: SparkSession, zone_dir: str, prefix: str) -> DataFrame:
    return spark.read.parquet(latest_version_path(zone_dir, prefix))


def as_of_version_path(zone_dir: str, prefix: str, as_of: str) -> str:
    """Time travel: resolve the newest snapshot whose version stamp is
    <= ``as_of`` (a ``YYYYMMDDHHMMSS`` stamp, or any prefix of one —
    "20260816" means end-of-that-second semantics apply to the padded
    stamp).  Zones are immutable and writes only ADD versions, so the
    answer is stable for as long as retention (``vacuum_zone``) keeps
    the snapshot — the reader-side half of the time-travel contract
    the immutability buys.  Metadata-only (one driver-side listing).
    """
    # a human-shaped input like '2026-08-16' would compare
    # lexicographically ('-' < '0') and silently resolve an old or
    # missing snapshot — reject anything but a digit-prefix of a stamp
    if not re.fullmatch(r"\d{1,14}", str(as_of)):
        raise ValueError(
            "as_of must be 1-14 digits of a YYYYMMDDHHMMSS stamp "
            f"(no separators), got {as_of!r}"
        )
    stamp = (str(as_of) + "9" * 14)[:14]
    candidates = []
    for name in os.listdir(zone_dir):
        if not name.startswith(prefix + "__"):
            continue
        m = VERSION_RE.search(name)
        if m and m.group(1) <= stamp:
            candidates.append((m.group(1), name))
    if not candidates:
        raise FileNotFoundError(
            f"no snapshot of prefix={prefix!r} at or before {as_of!r} in {zone_dir}"
        )
    _, newest = max(candidates)
    return os.path.join(zone_dir, newest)


def read_as_of(
    spark: SparkSession, zone_dir: str, prefix: str, as_of: str
) -> DataFrame:
    """Read the zone as it stood at ``as_of`` (see
    :func:`as_of_version_path`)."""
    return spark.read.parquet(as_of_version_path(zone_dir, prefix, as_of))


def version_history(zone_dir: str, prefix: str) -> list[dict]:
    """DESCRIBE HISTORY for a zone: one dict per snapshot, oldest →
    newest — version stamp, writer sha, streaming batch id (None for
    wall-clock versions), file count, bytes, and whether a seal
    sidecar is present.  Driver-side listing only; at object-store
    scale this is one LIST per snapshot dir."""
    out = []
    for name in list_versions(zone_dir, prefix):
        m = VERSION_RE.search(name)
        path = os.path.join(zone_dir, name)
        n_files = 0
        n_bytes = 0
        # the integrity sidecar is the _manifest dir (seal_zone /
        # write_versioned(manifest=True)); don't count its parquet as data
        sealed = os.path.isdir(os.path.join(path, "_manifest"))
        for root, _dirs, files in os.walk(path):
            if "_manifest" in root.split(os.sep):
                continue
            for f in files:
                if f.endswith(".parquet"):
                    n_files += 1
                    n_bytes += os.path.getsize(os.path.join(root, f))
        out.append(
            {
                "version": m.group(1),
                "writer": m.group(2),
                "stream_batch": stream_batch_id(name),
                "name": name,
                "n_files": n_files,
                "n_bytes": n_bytes,
                "sealed": sealed,
            }
        )
    return out


def seal_zone(
    spark: SparkSession, zone_dir: str, prefix: str
) -> tuple[int, str]:
    """Record the integrity sidecar on the NEWEST snapshot of
    ``prefix`` (idempotent: an existing sidecar is left untouched —
    sealing twice cannot re-notarize changed bytes) and return the
    zone fingerprint.  The post-hoc twin of
    ``write_versioned(manifest=True)``: a pipeline writes its zones
    normally and seals only what it releases, so intermediate zones
    never pay the read-back scan."""
    src = latest_version_path(zone_dir, prefix)
    mpath = os.path.join(src, "_manifest")
    if not os.path.exists(mpath):
        zone_manifest(spark, src).coalesce(1).write.parquet(mpath)
    # fold the (tiny) sidecar, not the data: sealing costs ONE data scan
    return _fold_manifest(spark.read.parquet(mpath))


def record_provenance(
    zone_dir: str, prefix: str, upstreams: list[str]
) -> dict[str, str | None]:
    """Record which upstream versions the newest ``prefix`` snapshot
    was built from: ``{upstream_prefix: version_ts}`` captured from the
    zone's CURRENT latest versions (call right after the product write,
    while the versions read are still the latest — the single-writer
    orchestration this zone layout assumes) into an underscore-prefixed
    ``_provenance.json`` sidecar inside the version dir.  With the
    manifest sidecar this completes the release story: WHAT the zone
    contains (fingerprint) and WHERE it came from (exact input
    versions).  Driver-side metadata only; returns the recorded dict.
    """
    import json

    src = latest_version_path(zone_dir, prefix)
    prov: dict[str, str | None] = {}
    for up in upstreams:
        try:
            m = VERSION_RE.search(latest_version_path(zone_dir, up))
            prov[up] = m.group(1) if m else None
        except FileNotFoundError:
            prov[up] = None
    with open(os.path.join(src, "_provenance.json"), "w") as f:
        json.dump(prov, f, indent=2, sort_keys=True)
    return prov


def read_provenance(zone_dir: str, prefix: str) -> dict[str, str | None]:
    """The recorded input versions of the newest ``prefix`` snapshot;
    raises when none were recorded."""
    import json

    src = latest_version_path(zone_dir, prefix)
    p = os.path.join(src, "_provenance.json")
    if not os.path.exists(p):
        raise FileNotFoundError(f"{src} has no _provenance.json sidecar")
    with open(p) as f:
        return json.load(f)


def verify_latest(spark: SparkSession, zone_dir: str, prefix: str) -> DataFrame:
    """Recompute the newest snapshot's manifest against the sidecar its
    release write recorded (``write_versioned(..., manifest=True)``)
    and return the mismatch frame — empty means the zone still
    bit-matches what was released.  Raises when the snapshot carries no
    manifest (an intermediate zone: nothing was promised)."""
    src = latest_version_path(zone_dir, prefix)
    mpath = os.path.join(src, "_manifest")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"{src} has no _manifest sidecar; write the release with "
            "manifest=True to make it verifiable"
        )
    return verify_zone(spark, src, spark.read.parquet(mpath))


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Globally range-partitioned sorted Parquet export.

    ``repartitionByRange`` + ``sortWithinPartitions`` gives a total
    order ACROSS files (file i's max key ≤ file i+1's min) with each
    file internally sorted — the layout that makes parquet zone-map /
    row-group pruning effective for range predicates downstream, at
    the cost of one range-exchange (sampled boundaries, no single-task
    global sort).  ``.write.sortBy`` needs a bucketed managed table;
    this works for plain paths.
    """
    out = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    out.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a hash-bucketed (optionally bucket-sorted) managed
    table: two tables bucketed on the same key with the same bucket
    count join WITHOUT any exchange (and without even a sort when both
    are bucket-sorted) — the pre-shuffled layout for fact tables that
    join repeatedly on one key at 100 TB.  One shuffle at write time
    buys zero shuffles on every subsequent join/aggregate on that key.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table)


def bucket_table_name(versioned: str) -> str:
    """Catalog-legal table name for a versioned zone directory name
    (``prefix__ts_sha__`` → lowercase ``[a-z0-9_]``)."""
    return re.sub(r"[^0-9a-zA-Z_]", "_", versioned).lower()


def write_bucketed_versioned(
    df: DataFrame,
    zone_dir: str,
    prefix: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    git_sha: str = "local",
    sort: bool = True,
) -> str:
    """Versioned snapshot persisted as an EXTERNAL hash-bucketed table:
    the zone keeps its immutable ``prefix__ts_sha__`` directory layout
    (``read_latest``/freshness logic unchanged) while the catalog entry
    carries the bucket spec, so same-key joins and aggregates on
    ``bucket_cols`` read the zone with ZERO exchange.  The bucket
    metadata lives in the session catalog — on a cluster that is the
    shared metastore; a fresh local session must re-register (or fall
    back to ``read_latest``, which reads the same files without the
    bucket-awareness).  Returns the written path.
    """
    # The catalog table name is derived from the versioned dir name,
    # whose timestamp is second-resolution — and unlike the zone dir,
    # the catalog is GLOBAL to the session.  Two same-prefix snapshots
    # written within one wall-clock second (two compactions, or two
    # test zones sharing a session) would collide on the table name
    # with mode errorifexists, so probe for an unused (path, table)
    # pair by extending the sha segment; the suffix keeps the
    # ``__ts_sha__`` format every loader parses.
    catalog = df.sparkSession.catalog
    n = 0
    while True:
        sha = git_sha if n == 0 else f"{git_sha}u{n}"
        name = versioned_name(prefix, sha)
        path = os.path.join(zone_dir, name)
        table = bucket_table_name(name)
        if not os.path.exists(path) and not catalog.tableExists(table):
            break
        n += 1
    w = df.write.mode("errorifexists").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").option("path", path).saveAsTable(table)
    return path


def read_latest_bucketed(
    spark: SparkSession, zone_dir: str, prefix: str
) -> DataFrame:
    """Resolve the newest versioned snapshot and read it THROUGH the
    catalog so the bucket layout feeds the planner (exchange-free
    same-key joins).  Falls back to a plain parquet read when the
    table is not in this session's catalog (correct, just unbucketed).
    """
    path = latest_version_path(zone_dir, prefix)
    table = bucket_table_name(os.path.basename(path))
    if spark.catalog.tableExists(table):
        return spark.table(table)
    return spark.read.parquet(path)


def zone_file_stats(zone_dir: str, prefix: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of the newest snapshot — a
    driver-side listing (metadata only), the signal a compaction
    scheduler watches."""
    src = latest_version_path(zone_dir, prefix)
    n, total = 0, 0
    for root, _dirs, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def row_fingerprint(cols: list[str], algo: str = "xxhash64"):
    """The per-row fingerprint expression behind :func:`zone_manifest`.

    ``xxhash64`` (default) hashes native column values JVM-side — the
    fast engine-local choice.  ``md5`` builds an engine-PORTABLE
    fingerprint: columns cast to string, unit-separator-joined, md5'd,
    first 15 hex digits as an integer — the same value any engine with
    md5 computes (DuckDB: ``('0x' || substr(md5(key), 1, 15))::BIGINT``),
    which is what lets cross-engine release checks replay the whole
    fold bit-for-bit (``tests/test_io.py`` pins the parity).  Trade-off:
    md5 pays string casts (float columns format engine-dependently —
    use it on string/integer columns) and 60 bits vs 64."""
    from pyspark.sql import functions as F

    if algo == "xxhash64":
        return F.xxhash64(*cols).cast("decimal(38,0)")
    if algo == "md5":
        key = F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in cols]
        )
        return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast(
            "decimal(38,0)"
        )
    raise ValueError(f"unknown fingerprint algo {algo!r}")


def zone_manifest(
    spark: SparkSession, path: str, algo: str = "xxhash64"
) -> DataFrame:
    """Release manifest for a written zone: one row per data file —
    ``(file, n_rows, content_fp)`` — plus the integrity contract a
    corpus release publishes next to its card ("which files, how many
    rows, and EXACTLY which content").

    ``content_fp`` is the DECIMAL(38,0) SUM of per-row fingerprints
    (:func:`row_fingerprint`) over all columns (sorted by name, so a
    column-reordering rewrite doesn't change it).  Integer addition is
    exact and commutative, so the fingerprint is invariant to row
    order, partitioning and shuffle-nondeterminism — two writes of the
    same rows fingerprint identically even when their file layouts
    differ — while any changed/dropped/duplicated row changes it
    (modulo the collision bound of the row hash itself).  Emitted as
    digit strings so downstream JSON/CSV tooling never mangles the
    38-digit sums.

    Scale shape: one scan; the aggregate is map-side combinable and
    keyed by file name, so the shuffle carries #files rows.
    """
    df = spark.read.parquet(path)
    cols = sorted(df.columns)
    import re as _re

    from pyspark.sql import functions as F

    # Key rows by the path RELATIVE to the zone root, not the basename:
    # a partitionBy write reuses identical part-file names across
    # partition dirs, and basename keying would merge those into one
    # manifest row (a deleted partition dir would then verify as
    # 'changed' instead of 'missing') — ADVICE r11 #1.  input_file_name
    # is a URI containing the zone path verbatim; stripping through it
    # leaves e.g. 'p=1/part-00000-….parquet'.
    rel = F.regexp_replace(
        F.input_file_name(), "^.*" + _re.escape(path.rstrip("/")) + "/", ""
    )
    return (
        df.select(
            rel.alias("file"),
            row_fingerprint(cols, algo).alias("_rh"),
        )
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_rh").cast("decimal(38,0)").cast("string").alias(
                "content_fp"
            ),
        )
    )


def release_fold(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Engine-portable release integrity fold: per-group
    ``(n_rows, content_fp)`` over the md5 row fingerprint of ALL
    columns sorted by name — the grouped generalization of
    :func:`zone_fingerprint` (group by source/shard/date instead of by
    file), and the released-dataset check another engine can replay
    verbatim: DuckDB's
    ``SUM(('0x' || substr(md5(key), 1, 15))::BIGINT::HUGEINT)`` over
    the same parquet produces the identical digit string
    (``tests/test_io.py::test_md5_fingerprint_fold_duckdb_parity``).

    Addition is exact and commutative on the integer fingerprints, so
    the fold is partition/order-invariant and map-side combinable —
    #groups rows of shuffle at any data size.  md5 fingerprints cast
    columns to string: use on string/integer/date columns (float
    formatting is engine-dependent — see :func:`row_fingerprint`).
    """
    from pyspark.sql import functions as F

    cols = sorted(df.columns)
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_fingerprint(cols, "md5"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("content_fp"),
    )


def row_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Row-level release diff between two snapshots keyed by ``keys``:
    ``(keys…, status)`` with status in {added (key only in new),
    removed (key only in old), changed (key in both, any non-key
    column differs)} — unchanged rows are absent, so an empty frame
    means the releases are row-identical.  The CDC-grade companion to
    :func:`verify_zone`'s file-level check: WHAT changed, not just
    THAT something changed.

    Non-key columns compare via the engine-portable md5 row
    fingerprint (name-sorted, string-cast — exact for string/integer/
    date columns, see :func:`row_fingerprint`), so the diff never
    widens rows across the join: each side reduces to (keys, fp)
    before the single full-outer join on the keys — the inherent
    shuffle for a keyed diff, nothing more.  Keys must be unique per
    side (the snapshot-grain contract; duplicate keys compare as
    their fingerprint MULTISET folded by sum, so a reordered duplicate
    pair still reads unchanged).
    """
    from pyspark.sql import functions as F

    def side(df: DataFrame, alias: str) -> DataFrame:
        val_cols = sorted(c for c in df.columns if c not in keys)
        return df.groupBy(*keys).agg(
            F.sum(row_fingerprint(val_cols, "md5"))
            .cast("decimal(38,0)")
            .alias(alias),
            F.count(F.lit(1)).alias(f"{alias}_n"),
        )

    a = side(old, "_old_fp")
    b = side(new, "_new_fp")
    joined = a.join(b, on=keys, how="full_outer")
    status = (
        F.when(F.col("_old_fp").isNull(), F.lit("added"))
        .when(F.col("_new_fp").isNull(), F.lit("removed"))
        .when(
            (F.col("_old_fp") != F.col("_new_fp"))
            | (F.col("_old_fp_n") != F.col("_new_fp_n")),
            F.lit("changed"),
        )
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*keys, "status")
    )


def schema_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Schema drift between two snapshots: ``(column, status,
    old_type, new_type)`` with status in {added, removed, retyped} —
    empty means the schemas agree (column ORDER is immaterial, the
    parquet zone contract).  Driver-side only: schemas are metadata,
    no job runs."""
    from pyspark.sql import functions as F  # noqa: F401 (kept local style)

    old_t = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    new_t = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    rows = []
    for c in sorted(set(old_t) | set(new_t)):
        if c not in new_t:
            rows.append((c, "removed", old_t[c], None))
        elif c not in old_t:
            rows.append((c, "added", None, new_t[c]))
        elif old_t[c] != new_t[c]:
            rows.append((c, "retyped", old_t[c], new_t[c]))
    return old.sparkSession.createDataFrame(
        rows, "column string, status string, old_type string, new_type string"
    )


def _fold_manifest(manifest: DataFrame) -> tuple[int, str]:
    """Fold a per-file manifest to the whole-zone ``(n_rows, fp)``
    pair.  Bounded collect: one row."""
    from pyspark.sql import functions as F

    row = manifest.agg(
        # empty manifest (empty zone / zero-row snapshot): SUM is NULL —
        # coalesce to the identity (0, '0') instead of an opaque
        # TypeError in the int() below (ADVICE r11 #2)
        F.coalesce(F.sum("n_rows").cast("long"), F.lit(0)).alias("n"),
        F.coalesce(
            F.sum(F.col("content_fp").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string"),
            F.lit("0"),
        ).alias("fp"),
    ).first()
    return int(row["n"]), row["fp"]


def zone_fingerprint(spark: SparkSession, path: str) -> tuple[int, str]:
    """Layout-invariant whole-zone identity ``(n_rows, content_fp)``:
    the file-level manifest folded once more, so two zones are
    content-equal across clusters/partitionings iff their fingerprints
    match — the cheap cross-site release check (no data transfer, two
    numbers)."""
    return _fold_manifest(zone_manifest(spark, path))


def verify_zone(
    spark: SparkSession, path: str, manifest: DataFrame
) -> DataFrame:
    """Recompute the zone's manifest and full-outer-join it against a
    recorded one: returns the mismatch frame ``(file, status)`` with
    ``status`` in {missing (recorded but absent), extra (present but
    unrecorded), changed (rows or fingerprint differ)} — empty means
    the zone bit-matches its manifest.  Joins on file name: #files
    rows a side, broadcastable both ways."""
    from pyspark.sql import functions as F

    cur = zone_manifest(spark, path).select(
        F.col("file"),
        F.col("n_rows").alias("_cur_rows"),
        F.col("content_fp").alias("_cur_fp"),
    )
    rec = manifest.select(
        "file",
        F.col("n_rows").alias("_rec_rows"),
        F.col("content_fp").alias("_rec_fp"),
    )
    joined = rec.join(cur, "file", "full_outer")
    status = (
        F.when(F.col("_cur_rows").isNull(), F.lit("missing"))
        .when(F.col("_rec_rows").isNull(), F.lit("extra"))
        .when(
            (F.col("_cur_rows") != F.col("_rec_rows"))
            | (F.col("_cur_fp") != F.col("_rec_fp")),
            F.lit("changed"),
        )
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select("file", "status")
    )


def compact_zone(
    spark: SparkSession,
    zone_dir: str,
    prefix: str,
    target_mb: int = 256,
    git_sha: str = "compact",
    range_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    partition_by: list[str] | None = None,
    compression: str = "lz4",
    zorder_by: list[str] | None = None,
    zorder_bits: int = 8,
    skipping_cols: list[str] | None = None,
) -> str:
    """Small-file compaction: rewrite the newest snapshot as a NEW
    version with ~``target_mb`` output files sized from the actual
    on-disk bytes.  ``skipping_cols`` writes the file-level min/max
    zone map (io/skipping.py) into the compacted snapshot — the
    natural moment to index, since compaction is exactly when the
    layout (range_by/zorder_by) makes per-file envelopes tight.

    ``zorder_by`` (mutually exclusive with ``range_by``) clusters the
    rewrite on the Morton key of SEVERAL integral columns
    (``operators/layout.py``) — the OPTIMIZE ZORDER form: one range
    exchange on the interleave key leaves every output file a
    hypercube of the key space, so min/max footers prune scans on any
    of the listed dimensions.  The key is dropped before writing;
    layout, not data, changes.

    A hive-partitioned snapshot must pass its ``partition_by`` columns
    again or the rewrite flattens the directory layout (the partition
    values survive as ordinary columns either way — layout, not data,
    is at stake).  With ``partition_by`` the file-count target applies
    per written task, so pair it with ``range_by`` on the partition
    columns when per-partition file counts matter.

    Streaming micro-batches and fine-grained partitioned appends leave
    zones as thousands of KB-scale files; at 100 TB that costs a task
    per file, a name-node/listing storm, and useless row groups.
    Compaction is the standing maintenance operator every incremental
    zone needs (the OPTIMIZE of table formats, expressed on the plain
    versioned-parquet zone).

    Shape: file count = ceil(bytes / target) from a driver-side
    listing; without a layout request the rewrite is a ``coalesce``
    (merges read partitions, NO shuffle — the cheap path); ``range_by``
    instead pays one sampled range exchange to ALSO establish disjoint
    per-file key ranges (file-level pruning) while it's rewriting.
    The zone stays immutable — compaction lands as a new version and
    ``read_latest`` flips over; old versions remain for time travel /
    in-flight readers (retention is the zone owner's policy).
    """
    src = latest_version_path(zone_dir, prefix)
    _, n_bytes = zone_file_stats(zone_dir, prefix)
    n_files = max(1, -(-n_bytes // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    # a same-second rewrite must still version-sort AFTER the source:
    # bump the timestamp past the source snapshot's
    src_ts = VERSION_RE.search(os.path.basename(src)).group(1)
    now = datetime.now(timezone.utc)
    if now.strftime("%Y%m%d%H%M%S") <= src_ts:
        from datetime import timedelta

        now = datetime.strptime(src_ts, "%Y%m%d%H%M%S").replace(
            tzinfo=timezone.utc
        ) + timedelta(seconds=1)
    if zorder_by and range_by:
        raise ValueError("pass zorder_by or range_by, not both")
    if zorder_by:
        from ..operators.layout import zorder_key

        keyed = zorder_key(df, zorder_by, bits=zorder_bits, out_col="_zkey")
        path = _write_versioned_at(
            keyed, zone_dir, prefix, git_sha, now,
            range_by=["_zkey"], n_files=n_files, compression=compression,
            partition_by=partition_by, drop_cols=["_zkey"],
        )
    elif range_by:
        path = _write_versioned_at(
            df, zone_dir, prefix, git_sha, now,
            range_by=range_by, n_files=n_files, compression=compression,
            partition_by=partition_by,
        )
    else:
        out = df.coalesce(n_files)
        if sort_by:
            out = out.sortWithinPartitions(*sort_by)
        path = _write_versioned_at(
            out, zone_dir, prefix, git_sha, now, compression=compression,
            partition_by=partition_by,
        )
    if skipping_cols:
        from .skipping import write_skipping_index

        write_skipping_index(spark, path, list(skipping_cols))
    return path


def _write_versioned_at(
    df: DataFrame,
    zone_dir: str,
    prefix: str,
    git_sha: str,
    now: datetime,
    range_by: list[str] | None = None,
    n_files: int | None = None,
    compression: str = "lz4",
    partition_by: list[str] | None = None,
    drop_cols: list[str] | None = None,
) -> str:
    # same same-second collision probe as write_versioned (the caller
    # pins `now`, so retries/back-to-back compactions WILL repeat it)
    name = versioned_name(prefix, git_sha, now)
    n = 0
    while os.path.exists(os.path.join(zone_dir, name)):
        n += 1
        name = versioned_name(prefix, f"{git_sha}u{n}", now)
    path = os.path.join(zone_dir, name)
    if range_by:
        df = (
            df.repartitionByRange(n_files, *range_by)
            if n_files
            else df.repartitionByRange(*range_by)
        )
        df = df.sortWithinPartitions(*range_by)
    if drop_cols:
        df = df.drop(*drop_cols)
    writer = df.write.mode("errorifexists").option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def list_versions(zone_dir: str, prefix: str) -> list[str]:
    """All versioned snapshot directory names for ``prefix``, oldest →
    newest (driver-side listing, metadata only)."""
    out = []
    for name in os.listdir(zone_dir):
        if not name.startswith(prefix + "__"):
            continue
        m = VERSION_RE.search(name)
        if m:
            out.append((m.group(1), name))
    return [name for _ts, name in sorted(out)]


FOLDED_LEDGER = "_FOLDED"


def stream_batch_id(version_name: str) -> int | None:
    """Streaming-delta batch id embedded in a version dir name
    (``prefix__00000000000042_stream__`` → 42), or None for batch
    (wall-clock) versions."""
    m = VERSION_RE.search(version_name)
    if m and m.group(2) == "stream":
        return int(m.group(1))
    return None


def folded_ledger(zone_dir: str, snapshot_prefix: str) -> tuple[set[str], int]:
    """The compaction ledger of the LATEST snapshot of
    ``snapshot_prefix``: the delta version-dir names already folded
    into it, plus the folded streaming batch-id high-water mark (−1
    when no stream delta has ever been folded).

    This is what makes index compaction safe against BOTH replay races
    (ADVICE r8): a streaming micro-batch replayed after its delta was
    folded+deleted is skipped by the sink (``batch_id <= hwm``), and a
    compaction crash between snapshot write and delta deletion leaves
    dirs that every loader and the next compaction ignore because the
    ledger already names them.
    """
    try:
        latest = latest_version_path(zone_dir, snapshot_prefix)
    except FileNotFoundError:
        return set(), -1
    path = os.path.join(latest, FOLDED_LEDGER)
    if not os.path.exists(path):
        return set(), -1
    with open(path, encoding="utf-8") as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    return set(lines[1:]), int(lines[0])


def write_folded_ledger(
    snapshot_path: str, folded_names: set[str], stream_hwm: int
) -> None:
    """Record the folded-delta ledger INSIDE a snapshot version dir
    (underscore-prefixed: invisible to parquet reads, travels and dies
    with its version through vacuum)."""
    with open(
        os.path.join(snapshot_path, FOLDED_LEDGER), "w", encoding="utf-8"
    ) as f:
        f.write(str(int(stream_hwm)) + "\n")
        for n in sorted(folded_names):
            f.write(n + "\n")


def vacuum_zone(
    spark: SparkSession,
    zone_dir: str,
    prefix: str,
    keep_last: int = 2,
) -> list[str]:
    """Zone retention (VERDICT r7 Next #7): delete superseded versioned
    snapshots, keeping the newest ``keep_last``.

    ``write_versioned`` / ``compact_zone`` only ever ADD versions — the
    immutability that gives readers time travel also means a zone grows
    by one full copy per write, and at 100 TB a compaction cadence of
    hours fills any disk in days.  Vacuum is the retention half of the
    maintenance pair (compact = fewer files, vacuum = fewer versions).

    Semantics:

    * the newest ``keep_last`` snapshots survive — ``read_latest`` and
      time travel to any KEPT version are unaffected;
    * a removed snapshot that was registered as an external bucketed
      table (``write_bucketed_versioned``) has its catalog entry
      dropped with it — same discipline as the streaming dedup index's
      snapshot compaction (streaming/dedup_index.py);
    * ``keep_last >= 1`` is enforced: a vacuum can never empty a zone.

    Caller contract at scale: pick ``keep_last`` to cover the longest
    in-flight reader (a job that resolved ``latest_version_path``
    before the vacuum must finish before its version is N writes
    stale) — the same grace-period reasoning as table-format VACUUM
    retention windows.

    Returns the removed snapshot paths (oldest first).
    """
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (a vacuum cannot empty a zone)")
    versions = list_versions(zone_dir, prefix)
    doomed = versions[: max(0, len(versions) - keep_last)]
    removed = []
    for name in doomed:
        table = bucket_table_name(name)
        if spark.catalog.tableExists(table):
            # external table: DROP removes only the catalog entry; the
            # rmtree below removes the data
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        path = os.path.join(zone_dir, name)
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    return removed
