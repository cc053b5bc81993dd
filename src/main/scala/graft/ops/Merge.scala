package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE (SCD-1 upsert) without a table format: the incremental-
  * load primitive every ETL service needs — apply a changes batch onto a
  * base snapshot, whole-row-replace on key collision, append otherwise.
  * (The reference delegates this to user DAGs; the streaming analog is
  * StreamOps.upsertSink's foreachBatch merge.)
  */
object Merge {

  /** Upsert `updates` onto `base` (same schema, unique `key` per side).
    *
    * Whole-row semantics: a key present in `updates` takes the ENTIRE
    * update row (including its nulls — this is not per-column coalesce,
    * which would silently resurrect base values under intentional
    * null-outs). Keys only in `base` pass through; keys only in
    * `updates` are inserts.
    *
    * Scale shape: ONE shuffle — a single full-outer sort-merge join on
    * the key; both sides' rows carry a presence marker so the select is
    * map-side. No driver materialization, no second pass for the
    * anti-join half (the `base.join(updates, anti) union updates`
    * formulation scans+shuffles `updates` twice and `base` once either
    * way — strictly worse).
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val others = base.columns.filterNot(_ == key).toSeq
    val u = updates.withColumn("__from_update", lit(true))
    base.as("b").join(u.as("u"), Seq(key), "full_outer")
      .select(col(key) +: others.map(c =>
        when(col("__from_update").isNotNull, col(s"u.$c"))
          .otherwise(col(s"b.$c")).as(c)): _*)
  }
}
