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

  /** SCD type-2 merge: apply a changes batch onto a history table,
    * CLOSING the current version of a changed key (valid_to := eff_ts)
    * and appending the new version, instead of overwriting — the
    * dimension-history primitive warehouses run nightly.
    *
    * Contract: `history` has columns (key, attrs…, valid_from,
    * valid_to) with valid_to NULL marking the current version and at
    * most one current row per key; `updates` has (key, attrs…, tsCol),
    * at most one row per key (pre-collapse a multi-change batch to its
    * latest state first — applying intra-batch history is upsert
    * folding, not a join).
    * An update whose attributes null-safe-equal the current version is
    * a no-op (no empty versions); an unknown key is a plain insert.
    *
    * Scale shape: closed rows (valid_to ≠ NULL) stream through
    * untouched — only CURRENT rows join the batch, so the shuffle is
    * O(live keys + batch), not O(history). The joined row emits its
    * 1–2 output versions via a map-side explode; one shuffle total.
    */
  def scd2(history: DataFrame, updates: DataFrame, key: String,
           tsCol: String): DataFrame =
    scd2(history, updates, Seq(key), tsCol)

  /** Composite-key SCD-2: the same contract keyed on a column TUPLE
    * (e.g. (tenant_id, natural_key) in a multi-tenant dimension). Side
    * presence is tracked with explicit markers rather than key
    * null-tests, so nullable key columns can't masquerade as absent
    * sides.
    */
  def scd2(history: DataFrame, updates: DataFrame, keys: Seq[String],
           tsCol: String): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val attrs = history.columns
      .filterNot(keys.toSet ++ Set("valid_from", "valid_to")).toSeq
    val closed = history.filter(col("valid_to").isNotNull)
    val current = history.filter(col("valid_to").isNull)
      .withColumn("__has_b", lit(true))
    val u = updates.select(
      (keys.map(k => col(k).as(s"__uk_$k")) ++
        Seq(col(tsCol).as("__eff"), lit(true).as("__has_u")) ++
        attrs.map(c => col(c).as(s"__u_$c"))): _*)
    val cond = keys.map(k => col(k) === col(s"__uk_$k")).reduce(_ && _)
    val j = current.join(u, cond, "full_outer")
    val differs = not(
      struct(attrs.map(c => col(s"__u_$c")): _*)
        <=> struct(attrs.map(col): _*))
    val out = struct(
      keys.map(k => coalesce(col(k), col(s"__uk_$k")).as(k)) ++
        attrs.map(col) ++ Seq(col("valid_from"), col("valid_to")): _*)
    val closedVersion = struct(
      keys.map(col) ++ attrs.map(col) ++
        Seq(col("valid_from"), col("__eff").as("valid_to")): _*)
    val newVersion = struct(
      keys.map(k => col(s"__uk_$k").as(k)) ++
        attrs.map(c => col(s"__u_$c").as(c)) ++
        Seq(col("__eff").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to")): _*)
    val versions =
      when(col("__has_u").isNull, array(out))              // untouched key
        .when(col("__has_b").isNull, array(newVersion))    // fresh insert
        .when(differs, array(closedVersion, newVersion))   // new version
        .otherwise(array(out))                             // no-op update
    closed.unionByName(
      j.select(explode(versions).as("__v")).select(col("__v.*")))
  }

  /** Apply an OUT-OF-ORDER CDC log: given change rows
    * (key, seq, op ∈ {I,U,D}, attrs…), reconstruct the final table
    * state — the latest op per key wins by sequence number (NOT by
    * arrival order, which is meaningless after a shuffle), and a final
    * delete erases the key. The debezium-style sink-side compaction
    * every CDC consumer needs.
    *
    * Contract: `seqCol` is unique per key (a total per-key version
    * order — the log producer's responsibility; enforceable with
    * [[Quality.Unique]]). Shape: ONE shuffle — per-key argmax via
    * `max_by(struct(attrs…), seq)` in a single hash aggregate with
    * map-side partials; the delete filter is map-side after it.
    */
  def cdcApply(log: DataFrame, key: String, seqCol: String,
               opCol: String): DataFrame = {
    val attrs = log.columns.filterNot(Set(key, seqCol, opCol)).toSeq
    val payload = struct((col(opCol) +: attrs.map(col)): _*)
    log.groupBy(col(key))
      .agg(max_by(payload, col(seqCol)).as("__last"))
      .filter(col(s"__last.$opCol") =!= "D")
      .select(col(key) +: attrs.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** Snapshot diff (batch CDC): compare two versions of a table and
    * emit each row's change verdict — `insert` (key only in `next`),
    * `delete` (only in `prev`), `update` (present in both, any column
    * null-safe-different). Unchanged rows are dropped. Row payload is
    * the AFTER image for insert/update, the BEFORE image for delete.
    * One full-outer shuffle on the key; the diff predicate is map-side.
    */
  def snapshotDiff(prev: DataFrame, next: DataFrame, key: String)
      : DataFrame = {
    val attrs = prev.columns.filterNot(_ == key).toSeq
    val n = next.select(
      col(key).as("__nk") +: attrs.map(c => col(c).as(s"__n_$c")): _*)
    val j = prev.join(n, col(key) === col("__nk"), "full_outer")
    val differs = not(
      struct(attrs.map(c => col(s"__n_$c")): _*)
        <=> struct(attrs.map(col): _*))
    j.select(
      (Seq(
        when(col(key).isNull, lit("insert"))
          .when(col("__nk").isNull, lit("delete"))
          .when(differs, lit("update")).as("change_type"),
        coalesce(col("__nk"), col(key)).as(key)) ++
        attrs.map(c =>
          when(col("__nk").isNotNull, col(s"__n_$c"))
            .otherwise(col(c)).as(c))): _*)
      .filter(col("change_type").isNotNull)
  }

  /** INCREMENTAL MATERIALIZED-VIEW MAINTENANCE for distributive
    * aggregates (count / sum — Gupta & Mumick's classic delta rules):
    * merge a signed per-key delta aggregate into a stored aggregate
    * without touching the base table. `baseAgg` carries (key, countCol,
    * sumCols…); `delta` carries one signed contribution per changed row
    * (`dCountCol` ∈ {-1, 0, +1}, signed sum deltas) — an insert is
    * (+1, +v), a delete (-1, -v), an in-place update (0, new−old).
    * Groups whose maintained count reaches 0 vanish (the view has no
    * such group after a full recompute either).
    *
    * Shape: ONE aggregation over the DELTA ONLY (map-side partials on
    * the small changed set) + one full-outer merge join against the
    * stored view (full-outer cannot broadcast — new keys must surface
    * from the delta side — so the merge shuffles both sides on the
    * key). At 100 TB the base table is never scanned: refresh cost is
    * O(delta) + O(view), and storing the view bucketed on the key
    * (q_join_bucketed's layout) makes its side of the merge
    * exchange-free.
    */
  def refreshAgg(baseAgg: DataFrame, delta: DataFrame, key: String,
                 countCol: String, dCountCol: String,
                 sumCols: Seq[(String, String)]): DataFrame = {
    val dAgg = delta.groupBy(col(key).as("__dk"))
      .agg(sum(col(dCountCol)).as("__dn"),
        sumCols.map { case (_, d) => sum(col(d)).as(s"__d_$d") }: _*)
    baseAgg.join(dAgg, col(key) === col("__dk"), "full_outer")
      .select(
        (Seq(coalesce(col(key), col("__dk")).as(key),
          (coalesce(col(countCol), lit(0L)) + coalesce(col("__dn"),
            lit(0L))).as(countCol)) ++
          sumCols.map { case (s, d) =>
            (coalesce(col(s), lit(0L)) + coalesce(col(s"__d_$d"),
              lit(0L))).as(s)
          }): _*)
      .filter(col(countCol) > 0)
  }
}
