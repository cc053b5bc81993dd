package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for the shuffle/skew regimes that matter at 100 TB.
  *
  * Default posture: plain `a.join(b, keys)` and let Catalyst+AQE pick
  * broadcast vs sort-merge and split skewed partitions
  * (`spark.sql.adaptive.skewJoin.enabled`). These helpers cover the two
  * cases the planner can't do alone.
  */
object Joins {

  /** Salted inner equi-join for pathological key skew that AQE's skew
    * split can't fix (e.g. one key = 40% of rows AND the build side is
    * too big to broadcast). The skewed (left) side gets a random salt in
    * [0, buckets); the right side is replicated `buckets`× with each
    * salt value; the join key becomes (key, salt), spreading one hot key
    * over `buckets` reducers. Row multiplicity is preserved exactly.
    *
    * Cost: right side shuffled `buckets`× — use only when right ≪ left
    * and the skew is real (measure first; AQE handles moderate skew).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int, seed: Int = 42): DataFrame = {
    val salted = left.withColumn("_salt",
      (rand(seed) * buckets).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Co-located fact-to-fact join: pre-partition both sides identically
    * on the key so the join itself adds NO extra exchange (Spark reuses
    * the children's hash partitioning). The cluster-persistent variant is
    * bucketed tables (`df.write.bucketBy(n, key).saveAsTable`), which
    * eliminates even these two exchanges on every subsequent join.
    */
  def colocatedJoin(left: DataFrame, right: DataFrame, key: String,
                    partitions: Int): DataFrame =
    left.repartition(partitions, col(key))
      .join(right.repartition(partitions, col(key)), key)

  /** Range-bucket join for monotone bucket tables (lo ≤ x < hi): instead
    * of a BroadcastNestedLoopJoin theta join, assign the bucket with a
    * binary-searchable expression (width_bucket) and equi-join — O(n log b)
    * and shuffle-free with a broadcast dim.
    */
  def widthBucketJoin(facts: DataFrame, value: Column,
                      lo: Double, hi: Double, nBuckets: Int): DataFrame =
    facts.withColumn("bucket",
      width_bucket(value, lit(lo), lit(hi), lit(nBuckets)))
}
