package graft.store

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Fact-store operations (reference: agrobr `cache/duckdb_store.py` +
  * `export.py`). The reference's cache is a single-node DuckDB file with
  * a staged `INSERT ... ON CONFLICT DO UPDATE` merge; here the same
  * semantics are a pure relational anti-join + union (updates win on PK
  * conflict), which at cluster scale becomes a partition-overwrite (or a
  * Delta/Iceberg MERGE where a table format is available): only the
  * partitions containing touched keys are rewritten, and the anti-join
  * shuffles on the PK — the updates side is typically small and
  * broadcast by AQE.
  */
object Store {

  /** MERGE semantics of `indicadores_upsert`
    * (`cache/duckdb_store.py:417-461`): rows matching an update PK are
    * replaced, new PKs are inserted. No chunking — that machinery exists
    * because DuckDB executes on one node; Spark partitions instead.
    */
  def upsert(base: DataFrame, updates: DataFrame, pk: Seq[String]): DataFrame =
    base.join(updates, pk, "left_anti").unionByName(updates)

  /** MERGE with additive schema evolution: updates may carry columns the
    * base lacks (backfilled null on surviving base rows) and may omit
    * base columns (null on inserted rows). Shared columns must keep
    * their types — silent widening hides corruption, so it stays an
    * analysis error.
    */
  def upsertEvolve(base: DataFrame, updates: DataFrame, pk: Seq[String]): DataFrame =
    base.join(updates.select(pk.map(col): _*), pk, "left_anti")
      .unionByName(updates, allowMissingColumns = true)

  /** Canonical content hash (reference `models.py:177-179`: sha256 over
    * the canonical CSV). Here: per-row canonical string, sorted, joined,
    * sha256 — one row out. Collects nothing to the driver, but the final
    * concat happens on one executor, so use it at presentation edges
    * (exports), as the reference does; for 100 TB-scale integrity use an
    * order-independent per-row-hash combine instead.
    */
  def contentHash(df: DataFrame, cols: Seq[String]): DataFrame = {
    val rowStr = concat_ws("|", cols.map(col): _*)
    df.select(rowStr.as("r"))
      .agg(count(lit(1)).as("n_rows"),
        sha2(array_join(array_sort(collect_list(col("r"))), "\n"), 256)
          .as("content_hash"))
  }

  /** Export with provenance sidecar (reference `export.py:20-101`):
    * parquet + `.meta.json` carrying row/column counts and the content
    * hash of the canonical form.
    */
  def exportWithHash(df: DataFrame, path: String, hashCols: Seq[String]): String = {
    df.write.mode(SaveMode.Overwrite).parquet(path)
    val h = contentHash(df, hashCols).collect()(0)
    val meta =
      s"""{"row_count": ${h.getLong(0)}, "column_count": ${df.columns.length},
         | "columns": [${df.columns.map(c => "\"" + c + "\"").mkString(", ")}],
         | "content_hash": "sha256:${h.getString(1)}"}""".stripMargin
    val p = java.nio.file.Paths.get(path + ".meta.json")
    java.nio.file.Files.writeString(p, meta)
    h.getString(1)
  }

  /** Predicate scan over the fact store (reference
    * `indicadores_query`, `cache/duckdb_store.py:339-400`): equality +
    * date-range predicates that Catalyst pushes into the parquet scan.
    */
  def factQuery(fact: DataFrame, predicates: Seq[Column], orderDesc: Column): DataFrame =
    predicates.foldLeft(fact)((d, p) => d.filter(p)).orderBy(orderDesc.desc)

  /** Endpoint diff of two snapshots keyed on the PK — the generic CDC
    * primitive behind [[TxStore.changesBetween]]: rows only in `after`
    * are inserts, rows only in `before` are deletes (pre-image
    * emitted), rows in both with any payload difference are updates
    * (post-image emitted). Payload columns compare as ONE null-safe
    * struct, so a column going null⇄non-null is a change and adding
    * columns never silently widens the compare. One full-outer shuffle
    * on the PK; unchanged rows are dropped before anything else moves.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, pk: Seq[String]): DataFrame = {
    require(before.columns.toSet == after.columns.toSet,
      "snapshots must share a schema (schema evolution diffs not supported)")
    val payload = before.columns.filterNot(pk.contains).toSeq
    val a = before.select(pk.map(col) :+ struct(payload.map(col): _*).as("_old"): _*)
    val b = after.select(pk.map(col) :+ struct(payload.map(col): _*).as("_new"): _*)
    a.join(b, pk, "full_outer")
      .withColumn("change_type",
        when(col("_old").isNull, "insert")
          .when(col("_new").isNull, "delete")
          .when(!(col("_old") <=> col("_new")), "update"))
      .filter(col("change_type").isNotNull)
      .select(pk.map(col) ++
        // per-COLUMN coalesce would corrupt an update that nulls a
        // field; pick the whole image by change type instead
        payload.map(c => when(col("change_type") === "delete", col(s"_old.$c"))
          .otherwise(col(s"_new.$c")).as(c)) :+
        col("change_type"): _*)
  }

  /** SCD Type-2 MERGE — the history-keeping upsert ([[upsert]] is
    * Type 1: updates overwrite). The dimension carries
    * `valid_from date, valid_to date (null = open), is_current boolean`
    * alongside `pk ++ tracked`; one merge of a change batch
    * `(pk, tracked..., changeDateCol)`:
    *  - new pk                   → open row inserted as-of the change date;
    *  - tracked attrs changed    → current row closed (valid_to = change
    *    date, is_current = false) + new open version inserted;
    *  - tracked attrs identical  → no-op (idempotent re-delivery);
    *  - history rows pass through untouched.
    * Set-based: ONE full-outer shuffle on the pk builds all four row
    * classes; at scale the change batch is small, so AQE broadcasts it
    * and the "shuffle" is a map-side join over the partitioned dim.
    * Null-safe comparison: a tracked attr going null⇄non-null is a
    * change.
    *
    * Reference keeps Type-1 history implicitly via snapshots
    * (`cache/duckdb_store.py:417-461` + snapshot tables); Type 2 is the
    * warehouse-standard dimension-history encoding of the same intent.
    */
  def scd2Merge(dim: DataFrame, changes: DataFrame, pk: Seq[String],
      tracked: Seq[String], changeDateCol: String = "change_date"): DataFrame = {
    val book = Seq("valid_from", "valid_to", "is_current")
    require(dim.columns.toSet == (pk ++ tracked ++ book).toSet,
      s"dim must carry exactly pk ++ tracked ++ $book")
    val current = dim.filter(col("is_current"))
    val history = dim.filter(!col("is_current"))
    // a batch may re-deliver the same pk (retries, late compaction):
    // latest change date wins, ties broken on the tracked values so
    // the merge stays deterministic — without this, duplicate pks
    // would fan out through the full-outer join into duplicate
    // versions. Apply intermediate changes in separate batches.
    val ch = changes.select(
        pk.map(col) ++ tracked.map(c => col(c).as(s"__new_$c")) :+
          col(changeDateCol).as("__chg"): _*)
      .groupBy(pk.map(col): _*)
      .agg(max(struct(col("__chg") +: tracked.map(c => col(s"__new_$c")): _*))
        .as("__w"))
      .select(pk.map(col) ++ tracked.map(c =>
        col(s"__w.__new_$c").as(s"__new_$c")) :+ col("__w.__chg").as("__chg"): _*)
    val j = current.join(ch, pk, "full_outer")
    val changed = tracked.map(c => !(col(c) <=> col(s"__new_$c"))).reduce(_ || _)
    val hasCur = col("is_current").isNotNull
    val hasChg = col("__chg").isNotNull
    val dimCols = dim.columns.toSeq
    val survivors = j.filter(hasCur && (!hasChg || !changed))
      .select(dimCols.map(col): _*)
    val closed = j.filter(hasCur && hasChg && changed)
      .withColumn("valid_to", col("__chg"))
      .withColumn("is_current", lit(false))
      .select(dimCols.map(col): _*)
    val validToType = dim.schema("valid_to").dataType
    val inserts = j.filter(hasChg && (!hasCur || changed))
      .select(dimCols.map {
        case c if pk.contains(c) => col(c)
        case c if tracked.contains(c) => col(s"__new_$c").as(c)
        case "valid_from" => col("__chg").as("valid_from")
        case "valid_to" => lit(null).cast(validToType).as("valid_to")
        case "is_current" => lit(true).as("is_current")
      }: _*)
    history.unionByName(survivors).unionByName(closed).unionByName(inserts)
  }

  /** Incremental aggregate maintenance: fold a DELTA's partial
    * aggregates into a maintained aggregate table by key — union of
    * two group-per-row tables and one re-combine, so refresh cost is
    * ∝ groups touched, never ∝ facts scanned. Sound for distributive
    * aggregates (sum, count; min/max too); carry DECIMAL partials so
    * the combine is associative bit-for-bit (s07 proves the maintained
    * table equals the full recompute). avg = maintained sum/count at
    * read time. The materialized-view refresh shape: at 100 TB the
    * nightly delta re-aggregates hours of data, not years.
    */
  def mergeAggregates(aggTable: DataFrame, deltaAgg: DataFrame,
      keys: Seq[String], measures: Seq[String]): DataFrame =
    aggTable.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(c => sum(col(c)).as(c)): _*)

  /** Bucketed table layout — the co-located-join story: both sides of
    * a recurring equi-join written with the SAME bucket count on the
    * join key (plus in-bucket sort) let every future sort-merge join
    * run with ZERO exchanges — the shuffle is paid once at write time,
    * not per query. This is the layout for the 100 TB fact⋈dim joins
    * too big to broadcast; the no-Exchange plan is asserted in
    * BucketedJoinSpec. Registered as an EXTERNAL table (explicit
    * `path`) so the parquet stays a plain directory; bucketing metadata
    * lives in the session catalog.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, key: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Partitioned fact layout (the Spark mirror of the reference's
    * DuckDB indexes on produto/data, `cache/duckdb_store.py:74-76`):
    * directory partitioning on the query keys means an equality filter
    * prunes whole partitions before any I/O. This is the layout the
    * 100 TB `indicadores` table ships with.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
