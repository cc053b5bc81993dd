package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Quality, TextAnalysis}
import graft.ops.Quality._

/** Data-quality constraint battery over the ingest tables — the contract
  * gate a production ETL service runs before publishing a load (the
  * reference accepts any blob whose extension dispatches,
  * `/root/reference/app/routes.py:115-125`; this is the missing row-level
  * contract layer). Non-vacuous by fixture construction: the generated
  * lineitem violates (l_orderkey, l_linenumber) uniqueness and the 5%
  * discount cap, so the battery exercises both verdicts.
  */
object QualityQueries {
  type Q = (SparkSession, String) => DataFrame

  def qQualityConstraints(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val customer = Tables.customer(spark, dir)
    val auditOrders = Quality.audit(orders, Seq(
      Complete("orders_custkey_complete", "o_custkey"),
      Unique("orders_orderkey_unique", Seq("o_orderkey")),
      OneOf("orders_status_accepted", "o_orderstatus", Seq("O", "F", "P")),
      Satisfies("orders_totalprice_positive", col("o_totalprice") > 0)))
    val auditLines = Quality.audit(lineitem, Seq(
      Unique("lineitem_line_unique", Seq("l_orderkey", "l_linenumber")),
      InRange("lineitem_discount_le_5pct", "l_discount", 0.0, 0.05),
      InRange("lineitem_quantity_range", "l_quantity", 1.0, 50.0),
      Complete("lineitem_shipdate_complete", "l_shipdate")))
    auditOrders
      .unionByName(auditLines)
      .unionByName(Quality.refIntegrity("ri_lineitem_orders",
        lineitem, "l_orderkey", orders, "o_orderkey"))
      .unionByName(Quality.refIntegrity("ri_orders_customer",
        orders, "o_custkey", customer, "c_custkey"))
      .orderBy(col("check_name"))
  }

  /** C4-style word-blocklist gate (Raffel et al. 2020 drop any page
    * containing a blocklisted word): per-token exact membership against
    * a term list, flag/keep accounting per source plus total hit
    * occurrences (duplicates counted — `filter`, not set intersection).
    * The fixture list mixes a common term (`slow`), a rare one (`dup`)
    * and an absent one (`legacy`) so all three hit regimes execute.
    *
    * Scale shape: the blocklist is a literal/broadcast array evaluated
    * MAP-SIDE inside codegen — zero shuffle before the per-source
    * aggregate. Real blocklists run to a few thousand terms: still a
    * broadcast; only substring (not word) matching would justify an
    * Aho–Corasick automaton instead.
    */
  def qTextBlocklist(spark: SparkSession, dir: String): DataFrame = {
    val blocklist = array(Seq("slow", "dup", "legacy").map(lit): _*)
    Tables.documents(spark, dir)
      .select(col("source"),
        size(filter(split(col("text"), "\\s+"),
          t => array_contains(blocklist, t))).as("n_hits"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L)).as("n_flagged"),
        sum(when(col("n_hits") > 0, 0L).otherwise(1L)).as("n_kept"),
        sum(col("n_hits").cast("long")).as("n_hits"))
      .orderBy(col("source"))
  }

  /** Re-identification risk report (Sweeney 2002 k-anonymity;
    * Machanavajjhala et al. 2007 l-diversity) over the quasi-identifier
    * pair (nation, market segment) with the $2k account-balance bucket
    * as the sensitive attribute: each equivalence class reports its
    * size (k-anonymity, k = 8) and its sensitive-value diversity
    * (distinct-l-diversity, l = 4). The release gate a dataset with
    * joinable demographics needs before publication — classes failing
    * either test are the suppression/generalization work-list.
    *
    * Scale shape: one hash aggregate over the table (count +
    * distinct-sensitive per class — the distinct is per-class-bounded,
    * never global); the report is |classes| rows.
    */
  def qQualityKanon(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select($"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / 2000).cast("long").as("bal_bucket"))
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("class_size"),
        countDistinct($"bal_bucket").as("n_sensitive"))
      .select($"c_nationkey", $"c_mktsegment", $"class_size",
        $"n_sensitive",
        ($"class_size" >= 8).as("k_anon_ok"),
        ($"n_sensitive" >= 4).as("l_div_ok"))
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  /** DIFFERENTIAL-PRIVACY noisy release of the (lang, source) document
    * histogram — the ε-DP publication gate next to k-anonymity: each
    * cell's count gets Laplace(1/ε) noise (ε = 1) via the inverse CDF,
    * and only cells whose NOISY count clears the release threshold
    * (τ = 8 — splitting this fixture non-vacuously, its largest cell
    * being 16 docs) publish — raw counts never leave. The "randomness" is a
    * deterministic md5-derived uniform per cell (the q_stat_bootstrap
    * hash-uniform device), so the privacy MECHANISM — noise shape,
    * thresholding, no-raw-output — is exercised with a replayable
    * oracle; a production deployment swaps in a real entropy source
    * (and that substitution is the ONLY difference).
    *
    * Scale: one hash aggregate; noise/threshold are map-side on the
    * (tiny) cell table.
    */
  def qQualityDpRelease(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("u", expr(
        """CAST(conv(substring(md5(concat(lang, ':', source)), 1, 8),
          |  16, 10) AS BIGINT) / 4294967296.0""".stripMargin
          .replace("\n", " ")))
      .withColumn("noisy", expr(
        "cnt + (0.0 - sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)))"))
      .filter($"noisy" >= 8.0)
      .select($"lang", $"source", round($"noisy", 6).as("noisy_r6"))
      .orderBy($"lang", $"source")
  }

  /** UNICODE NFC NORMALIZATION GATE (UAX #15) — the hygiene pass a
    * multilingual corpus needs before dedup: the same visible text can
    * arrive composed (é = U+00E9) or decomposed (e + U+0301), and
    * every downstream hash (MinHash signatures, exact-dedup digests,
    * winnow fingerprints) treats them as different documents unless
    * ingestion canonicalizes. The ASCII fixture carries no non-NFC
    * content, so the gate's subject is constructed IDENTICALLY in
    * both engines: every 5th doc gets a combining acute (U+0301)
    * inserted after its first 'e' — a decomposed pair NFC must
    * compose back. Per-doc output pins the full normalized payload
    * via md5, not just lengths, so the two engines' normalizers
    * (java.text.Normalizer vs ICU) are certified to agree
    * byte-for-byte. Composition shortens each doc by exactly 1
    * codepoint — both length columns are asserted by the oracle.
    *
    * Scale shape: pure map-side (one scalar UDF — the documented
    * non-codegen exception, see [[TextAnalysis.nfcNormalize]]);
    * composes with scan pruning; no shuffle at all before the
    * ORDER BY.
    */
  def qTextNfc(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 5 === 0 && instr(col("text"), "e") > 0)
      .withColumn("p", instr(col("text"), "e"))
      .withColumn("mutated", concat(
        expr("substring(text, 1, p)"), lit("\u0301"),
        expr("substring(text, p + 1, length(text))")))
      .withColumn("normalized", TextAnalysis.nfcNormalize(col("mutated")))
      .select(col("doc_id"), col("source"),
        length(col("mutated")).cast("long").as("len_raw"),
        length(col("normalized")).cast("long").as("len_nfc"),
        (col("mutated") =!= col("normalized")).as("changed"),
        md5(to_binary(col("normalized"), lit("utf-8"))).as("nfc_md5"))
      .orderBy(col("doc_id"))
  }

  val defs: Map[String, Q] = Map(
    "q_text_nfc" -> (qTextNfc(_, _)),
    "q_quality_dp_release" -> (qQualityDpRelease(_, _)),
    "q_quality_kanon" -> (qQualityKanon(_, _)),
    "q_quality_constraints" -> (qQualityConstraints(_, _)),
    "q_text_blocklist" -> (qTextBlocklist(_, _))
  )

  val oracles: Map[String, String] = Map(
    // same deterministic mutation (chr(769) = U+0301 combining acute),
    // ICU nfc_normalize vs java.text.Normalizer — md5 pins the payload
    "q_text_nfc" ->
      """WITH m AS (SELECT doc_id, source,
        |    substring(text, 1, instr(text, 'e')) || chr(769) ||
        |      substring(text, instr(text, 'e') + 1, length(text))
        |      AS mutated
        |  FROM documents
        |  WHERE doc_id % 5 = 0 AND instr(text, 'e') > 0),
        |n AS (SELECT doc_id, source, mutated,
        |    nfc_normalize(mutated) AS normalized FROM m)
        |SELECT doc_id, source,
        |  CAST(length(mutated) AS BIGINT) AS len_raw,
        |  CAST(length(normalized) AS BIGINT) AS len_nfc,
        |  (mutated <> normalized) AS changed,
        |  md5(normalized) AS nfc_md5
        |FROM n ORDER BY doc_id""".stripMargin,
    // same md5-uniform, same inverse-CDF Laplace, same τ gate
    "q_quality_dp_release" ->
      """WITH c AS (SELECT lang, source, count(*) AS cnt
        |  FROM documents GROUP BY lang, source),
        |n AS (SELECT lang, source, cnt,
        |    CAST(list_sum(list_transform(generate_series(1, 8),
        |      d -> CAST(strpos('0123456789abcdef',
        |          substring(md5(lang || ':' || source), CAST(d AS INT),
        |          1)) - 1 AS BIGINT)
        |        * (CAST(1 AS BIGINT) << CAST(4 * (8 - d) AS INT))))
        |      AS BIGINT) / 4294967296.0 AS u
        |  FROM c),
        |r AS (SELECT lang, source,
        |    cnt + (0.0 - sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)))
        |      AS noisy
        |  FROM n)
        |SELECT lang, source, round(noisy, 6) AS noisy_r6
        |FROM r WHERE noisy >= 8.0
        |ORDER BY lang, source""".stripMargin,
    "q_quality_kanon" ->
      """SELECT c_nationkey, c_mktsegment,
        |  COUNT(*) AS class_size,
        |  COUNT(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT))
        |    AS n_sensitive,
        |  COUNT(*) >= 8 AS k_anon_ok,
        |  COUNT(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) >= 4
        |    AS l_div_ok
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q_quality_constraints" ->
      """WITH o AS (SELECT count(*) AS total,
        |    count(*) - count(o_custkey) AS v_complete,
        |    count(*) - count(DISTINCT o_orderkey) AS v_unique,
        |    count(*) FILTER (o_orderstatus IS NULL
        |      OR o_orderstatus NOT IN ('O','F','P')) AS v_status,
        |    count(*) FILTER (o_totalprice IS NULL
        |      OR NOT (o_totalprice > 0)) AS v_pos
        |  FROM orders),
        |l AS (SELECT count(*) AS total,
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |      AS v_unique,
        |    count(*) FILTER (l_discount IS NULL OR l_discount < 0
        |      OR l_discount > 0.05) AS v_disc,
        |    count(*) FILTER (l_quantity IS NULL OR l_quantity < 1
        |      OR l_quantity > 50) AS v_qty,
        |    count(*) - count(l_shipdate) AS v_ship
        |  FROM lineitem),
        |ri1 AS (SELECT count(*) AS v,
        |    (SELECT count(*) FROM lineitem) AS total
        |  FROM lineitem l LEFT JOIN orders o
        |    ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderkey IS NULL),
        |ri2 AS (SELECT count(*) AS v,
        |    (SELECT count(*) FROM orders) AS total
        |  FROM orders od LEFT JOIN customer c
        |    ON od.o_custkey = c.c_custkey
        |  WHERE c.c_custkey IS NULL),
        |rows0 AS (
        |  SELECT 'orders_custkey_complete' AS check_name,
        |    v_complete AS violations, total FROM o
        |  UNION ALL SELECT 'orders_orderkey_unique', v_unique, total FROM o
        |  UNION ALL SELECT 'orders_status_accepted', v_status, total FROM o
        |  UNION ALL SELECT 'orders_totalprice_positive', v_pos, total FROM o
        |  UNION ALL SELECT 'lineitem_line_unique', v_unique, total FROM l
        |  UNION ALL SELECT 'lineitem_discount_le_5pct', v_disc, total FROM l
        |  UNION ALL SELECT 'lineitem_quantity_range', v_qty, total FROM l
        |  UNION ALL SELECT 'lineitem_shipdate_complete', v_ship, total FROM l
        |  UNION ALL SELECT 'ri_lineitem_orders', v, total FROM ri1
        |  UNION ALL SELECT 'ri_orders_customer', v, total FROM ri2)
        |SELECT check_name, violations, total, violations = 0 AS pass
        |FROM rows0 ORDER BY check_name""".stripMargin,
    "q_text_blocklist" ->
      """WITH t AS (
        |  SELECT source,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      x -> list_contains(['slow', 'dup', 'legacy'], x)))
        |      AS n_hits
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged,
        |  CAST(SUM(CASE WHEN n_hits > 0 THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(SUM(n_hits) AS BIGINT) AS n_hits
        |FROM t GROUP BY source ORDER BY source""".stripMargin
  )
}
