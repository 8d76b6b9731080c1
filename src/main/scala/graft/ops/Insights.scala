package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.{Canon, Tables}

/** Round-11 decision-analytics family: the operators an analytics
  * engine grows once the warehouse basics (Relational), event
  * histories (Analytics) and curation pipelines (TextAnalysis) are in
  * place — interval algebra, time-series resampling, cross-corpus
  * sketch comparison, the nonparametric/categorical halves of the A/B
  * toolkit, rule mining, budget allocation, and skyline queries.
  *
  * House canon throughout (SURVEY §5.3): timestamps travel as epoch-µs
  * longs ([[Tables.tsUs]]); every count/interval is exact integer
  * arithmetic; stored doubles travel untouched (bit-exact cross-
  * engine); derived ratios are ONE IEEE expression over exact inputs
  * rounded at 1e-4; deterministic hashing is md5 (never an
  * engine-private seed). Deterministic total orders everywhere a
  * window or emission needs one.
  */
object Insights {

  private val DayUs = 86400000000L

  // --- b77: interval coalescing (gaps-and-islands merge) -----------

  /** Half-open activity interval width: each event opens 30 min. */
  private[graft] val IntervalUs = 1800000000L

  /** b77 — interval coalescing: give every event a half-open activity
    * interval `[ts, ts+30min)` and merge each user's overlapping or
    * touching intervals into maximal islands — the gaps-and-islands
    * operator behind availability windows, on-call coverage, and
    * session stitching (the inverse view of b44's gap sessions: there
    * the GAP defines the boundary, here the OVERLAP defines the
    * merge).
    *
    * Shape: one hash shuffle on `user_id` serves everything — the
    * running `max(end)` window detects island starts
    * (`start > max(end) over preceding`), the running sum numbers
    * islands, and both downstream aggregations group by
    * `(user_id, island)` / `user_id`, which `HashPartitioning(user_id)`
    * already satisfies (grouping keys ⊇ partitioning keys), so
    * Catalyst inserts NO second exchange. At 100 TB this is one
    * shuffle of the events table, then map-local work.
    *
    * Determinism: pure integer µs arithmetic end-to-end; the window
    * order `(start, event_id)` is total (event_id unique).
    */
  def intervalCoalesce(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val iv = ev.select(col("user_id"), col("event_id"),
      Tables.tsUs(ev).as("s"),
      (Tables.tsUs(ev) + lit(IntervalUs)).as("e"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s").asc, col("event_id").asc)
    val withIsland = iv
      .withColumn("prev_max_e",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    withIsland
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("istart"), max(col("e")).as("iend"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("iend") - col("istart")).as("covered_us"),
        max(col("iend") - col("istart")).as("longest_us"))
      .orderBy("user_id")
  }

  // --- b78: daily resample + forward fill --------------------------

  /** b78 — time-series resampling: snap each user's irregular event
    * stream to a DAILY grid from their first to last active day,
    * carry the day's closing `value` (last observation by
    * `(ts, event_id)`), and forward-fill silent days from the prior
    * close — the gap-filling step every downstream window/trend
    * operator (b26/b27, c91, c112) implicitly assumes has already
    * happened on calendar-gridded data.
    *
    * Shape built for 100 TB: raw events collapse to `(user, day)`
    * grain FIRST (one map-side-combinable max-of-struct aggregate —
    * the struct's `(ts_us, event_id)` prefix is a total order, so
    * `max` IS "last observation"), and only day-grain rows ever reach
    * the spine join and the forward-fill window. The date spine is
    * `sequence(min_day, max_day)` exploded per user — output rows =
    * Σ user spans, never a cross join against a global calendar.
    *
    * Determinism: days are integer µs-div; `value` is a STORED double
    * carried untouched (bit-exact cross-engine); the fill window's
    * `last(ignore nulls)` over `ORDER BY day` is total per user.
    */
  def resampleFfill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val e = ev.select(col("user_id"), col("event_id"), col("value"),
        Tables.tsUs(ev).as("ts_us"))
      .withColumn("day", expr(s"ts_us div $DayUs"))
    val closes = e
      .groupBy(col("user_id"), col("day"))
      .agg(max(struct(col("ts_us"), col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("day"), col("m.value").as("close"))
    val spine = closes
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .select(col("user_id"),
        explode(sequence(col("dmin"), col("dmax"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(closes, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        last(col("close"), ignoreNulls = true).over(w).as("value"),
        when(col("close").isNotNull, 1).otherwise(0).as("observed"))
      .orderBy("user_id", "day")
  }

  // --- c121: KMV pairwise set-overlap sketches ---------------------

  /** Sketch size for the pairwise overlap estimator (rel err
    * ~1/√(k−2) ≈ 18%; the fixture trigram vocabularies are in the
    * thousands, so the order-statistics branch always executes —
    * the c101/round-10 lesson). */
  private[graft] val PairK = 32

  /** The md5 dyadic hash shared with c101's KMV (Relational.scala):
    * first 8 hex digits → uniform u ∈ (0,1). */
  private def mdU(c: Column): Column =
    (conv(substring(md5(c), 1, 8), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)

  /** Distinct (source, trigram-shingle) stream over `documents` —
    * word TRIgrams, because the fixture's 20 sources share one
    * ~31-word pool: unigram and bigram vocabularies saturate to
    * near-identical sets, while the ~30k-slot trigram space stays
    * partially filled per source and pairwise overlap is a real
    * quantity to estimate. Exposed for the mergeability spec.
    */
  private[graft] def sourceGrams(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), split(col("text"), " ").as("ws"))
      .where(size(col("ws")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(ws)-3), i -> " +
          "concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")).as("g"))
      .distinct()

  /** c121 — pairwise corpus overlap by KMV sketch (Bar-Yossef et al.
    * RANDOM 2002; Beyer et al. SIGMOD 2007's distinct-value synopses
    * — public): estimate, for every pair of document sources, the
    * Jaccard similarity and intersection size of their trigram
    * vocabularies FROM k-SIZED SKETCHES ALONE — the cross-corpus
    * contamination/overlap audit that at 100 TB must not join two
    * token streams (c29's decontamination joins actual grams; THIS
    * answers "which corpus pairs are worth that join" from synopses).
    *
    * Algebra (per pair A,B): merge the two k-min sketches, re-take
    * the k smallest of the union; ρ = fraction of those present in
    * BOTH sketches estimates Jaccard; (k−1)/u_(k) of the merged
    * sketch estimates |A∪B|; their product estimates |A∩B|. All
    * md5-deterministic, so the WHOLE estimator hash-verifies
    * cross-engine; the exact Jaccard/intersection ride along as
    * audit columns (fixture-affordable; at scale you'd ship only the
    * sketch columns — 20 sources × k rows, kilobytes from 100 TB).
    *
    * Scale: sketches are per-source k-row tables (WindowGroupLimit
    * prunes each partition to local k before the exchange); the pair
    * stage joins 190 × 2k rows — driver-trivial at ANY corpus size.
    */
  def kmvPairOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val grams = sourceGrams(Tables.t(spark, sfDir, "documents"))
    // Exact audit: distinct-gram counts and pairwise intersections.
    val nExact = grams.groupBy(col("source")).agg(count(lit(1)).as("n"))
    // r18 optimization: the pairwise intersections come from a
    // ROW-LOCAL i<j fan over each gram's sorted source set (≤20
    // sources, the c196 discipline) instead of a gram-keyed
    // grams×grams self-join — the self-join duplicated the whole
    // trigram explode+distinct chain under both inputs and shuffled
    // every co-occurrence as a joined row (part of c121's measured
    // 3.1 s wall / 7.7 s cpu at sf0.1; guide §2.4). Counts are
    // identical: fan pairs = exactly the (source_a < source_b) rows
    // the join produced, and the per-gram fan is sources²-bounded at
    // any corpus size.
    val pairsExact = grams.groupBy(col("g"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .where(size(col("ss")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ss) - 2),
          |  i -> transform(sequence(i + 1, size(ss) - 1),
          |    j -> struct(ss[i] AS sa, ss[j] AS sb))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.sa").as("source_a"), col("p.sb").as("source_b"))
      .agg(count(lit(1)).as("inter_exact"))
    // Sketches: k smallest distinct hash values per source.
    val hashed = grams.select(col("source"), mdU(col("g")).as("u")).distinct()
    val sk = hashed
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("u").asc)))
      .where(col("rn") <= PairK)
      .select(col("source"), col("u"))
    // Every source pair; merge the two sketches, k smallest of union.
    // r18 optimization: ONE evaluation of the sketch table fans each
    // sketch row to its 19 pair slots (broadcast partner list,
    // least/greatest orient the pair and the side flag) — the old
    // ska/skb union evaluated the whole (trigram vocab → md5 →
    // distinct → per-source k-min window) chain TWICE, which was most
    // of c121's remaining 3.1 s wall at sf0.1 (guide §1.2 "don't
    // compute things twice"). Merged rows are identical: (pair, u)
    // with a membership flag per side, max-merged as before.
    val srcs = nExact.select(col("source").as("s2"))
    val merged = sk
      .join(broadcast(srcs), col("s2") =!= col("source"))
      .select(
        least(col("source"), col("s2")).as("sa"),
        greatest(col("source"), col("s2")).as("sb"),
        col("u"),
        when(col("source") < col("s2"), 1L).otherwise(0L).as("in_a"),
        when(col("source") > col("s2"), 1L).otherwise(0L).as("in_b"))
      .groupBy(col("sa"), col("sb"), col("u"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("sa"), col("sb")).orderBy(col("u").asc)))
      .where(col("rn") <= PairK)
    val est = merged.groupBy(col("sa"), col("sb"))
      .agg(sum(col("in_a") * col("in_b")).as("matches"),
        max(when(col("rn") === PairK, col("u"))).as("uk"))
    pairsExact
      .join(nExact.withColumnRenamed("source", "source_a")
        .withColumnRenamed("n", "n_a"), Seq("source_a"))
      .join(nExact.withColumnRenamed("source", "source_b")
        .withColumnRenamed("n", "n_b"), Seq("source_b"))
      .join(est, col("source_a") === col("sa") && col("source_b") === col("sb"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("inter_exact"),
        round(col("inter_exact").cast("double") /
          (col("n_a") + col("n_b") - col("inter_exact")), 4).as("j_exact"),
        round(col("matches").cast("double") / lit(PairK), 4).as("j_kmv"),
        round(lit(PairK - 1) / col("uk"), 2).as("d_union_est"),
        round(col("matches").cast("double") / lit(PairK) *
          (lit(PairK - 1) / col("uk")), 2).as("inter_est"))
      .orderBy("source_a", "source_b")
  }

  // --- c122: chi-squared test of proportions -----------------------

  /** The per-USER A/B arm — md5 on user_id (c90's split hashes
    * event_id because its unit is the event; a PROPORTIONS test's
    * unit is the user). */
  private def userArmA(u: Column): Column =
    substring(md5(concat(lit("arm:"), u.cast("string"))), 1, 1) < "8"

  /** Conversion cut for c122: the user's FIRST event of the type has
    * `value` above this (the fixture median is ~35, so the Bernoulli
    * sits well inside (0,1) — every user performing every type made a
    * has-the-event definition degenerate: all four 2×2 margins
    * saturated and χ²'s denominator was zero). */
  private[graft] val ConvCut = 50.0

  /** c122 — Pearson chi-squared test of proportions (Pearson 1900 —
    * public): for each event type, does the fraction of CONVERTING
    * users differ between the md5-split A/B arms? The CATEGORICAL
    * half of the experiment readout — c90's Welch t compares means of
    * a continuous metric, this compares rates, which is what most
    * product experiments actually ship on. Conversion = the user's
    * first event of the type (by `(ts, event_id)`) carries
    * `value > `[[ConvCut]] — exactly one Bernoulli per (user, type),
    * so the rate cannot saturate with corpus size.
    *
    * χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) over the 2×2 table of
    * exact integer user counts — one IEEE expression rounded at 1e-4,
    * NULL-guarded on a degenerate margin (ANSI division would throw;
    * at planetary user counts the int64→double products lose ulps —
    * swap the four factors to DECIMAL(38,0), same plan shape).
    *
    * Shape: first-event-per-(user,type) is one map-side-combinable
    * min-of-struct aggregate; everything after runs on (users × 5)
    * rows at any corpus size.
    */
  def chi2Proportions(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val firsts = ev
      .select(col("user_id"), col("event_type"), col("value"),
        Tables.tsUs(ev).as("ts_us"), col("event_id"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(struct(col("ts_us"), col("event_id"), col("value"))).as("f"))
      .select(col("user_id"), col("event_type"),
        (col("f.value") > ConvCut).as("conv"))
      .withColumn("a", userArmA(col("user_id")))
    val t = firsts.groupBy(col("event_type"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("a") && col("conv"), 1L).otherwise(0L)).as("conv_a"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("a") && col("conv"), 1L).otherwise(0L)).as("conv_b"))
    val (aa, bb, cc, dd) = (col("conv_a").cast("double"),
      (col("n_a") - col("conv_a")).cast("double"),
      col("conv_b").cast("double"),
      (col("n_b") - col("conv_b")).cast("double"))
    val denom = (aa + bb) * (cc + dd) * (aa + cc) * (bb + dd)
    t.select(col("event_type"), col("n_a"), col("conv_a"),
        col("n_b"), col("conv_b"),
        round(aa / col("n_a"), 4).as("rate_a"),
        round(cc / col("n_b"), 4).as("rate_b"),
        when(denom > 0.0,
          round((aa + bb + cc + dd) * (aa * dd - bb * cc) * (aa * dd - bb * cc)
            / denom, 4)).as("chi2"))
      .orderBy("event_type")
  }

  // --- c123: Mann–Whitney U test -----------------------------------

  /** c123 — Mann–Whitney U rank-sum test (Mann & Whitney 1947 —
    * public), tie-corrected: the NONPARAMETRIC complement of c90's
    * Welch t — heavy-tailed per-user revenue metrics violate t's
    * normality assumption, rank tests don't care. Unit = user; metric
    * = the user's exact-decimal total `value` per event type; arms =
    * c122's md5 user split.
    *
    * Ranks: average-rank-of-ties = `rank() + (ties−1)/2` — integers
    * and exact halves, so R₁ and U₁ are EXACT (emitted at their own
    * 0.5 grain); the tie term T = Σ(t³−t) is exact integer; only the
    * final z is an IEEE expression, rounded at 1e-4. Metric ties are
    * engine-consistent because the metric is an exact decimal sum
    * emitted as double.
    *
    * Scale (round 12): every rank quantity depends only on the metric
    * VALUE, so users collapse to per-(type, value) TALLY rows first
    * (map-side combined) and the tie-averaged rank assembles from
    * [[OrderStats.cumLe]]'s two-pass cumulative count —
    * `rank = cum_le − ties + 1`, `avg_rk = rank + (ties−1)/2` — the
    * §5.3 rule 9 shape (the round-11 form sorted each type's whole
    * user population in one task). r1 stays exact under any order:
    * avg_rk values are exact halves, and integer-weighted sums of
    * halves are exact in double far past any population size.
    */
  def mannWhitneyU(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val metric = ev
      .select(col("user_id"), col("event_type"), col("value"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(Canon.dsum(col("value")).as("m"))
      .withColumn("a", userArmA(col("user_id")))
    val tall = metric.groupBy(col("event_type"), col("m").as("v"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("a"), 1L).otherwise(0L)).as("na_v"))
    val ranked = OrderStats.cumLe(tall, Seq("event_type"), Nil)
      .withColumn("rk", col("cum_le") - col("cnt") + 1)
      .withColumn("avg_rk",
        col("rk").cast("double") + (col("cnt") - 1).cast("double") / 2.0)
    val agg = ranked.groupBy(col("event_type"))
      .agg(sum(col("na_v")).as("n1"),
        sum(col("cnt") - col("na_v")).as("n2"),
        sum(col("na_v").cast("double") * col("avg_rk")).as("r1"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie_term"))
    val n = (col("n1") + col("n2")).cast("double")
    val u1 = col("r1") - col("n1").cast("double") *
      (col("n1") + 1).cast("double") / 2.0
    val mu = col("n1").cast("double") * col("n2").cast("double") / 2.0
    val varU = col("n1").cast("double") * col("n2").cast("double") / 12.0 *
      ((n + 1.0) - col("tie_term").cast("double") / (n * (n - 1.0)))
    agg.select(col("event_type"), col("n1"), col("n2"),
        round(u1, 1).as("u_stat"),
        // Nested guard: the outer n>1 keeps the tie term's n(n−1)
        // divisor from evaluating on a 1-row group (ANSI throws).
        when(n > 1.0, when(varU > 0.0, round((u1 - mu) / sqrt(varU), 4)))
          .as("z"))
      .orderBy("event_type")
  }

  // --- c124: Benford first-digit audit ------------------------------

  /** c124 — Benford's-law first-digit audit (Newcomb 1881 / Benford
    * 1938 — public; the fraud/data-quality screen): the distribution
    * of leading significant digits of `o_totalprice` against
    * log10(1+1/d), with per-digit χ² contributions. (TPC-H-ish
    * uniform prices do NOT follow Benford — the audit's job is to
    * SAY so, loudly, per digit.)
    *
    * Determinism: the leading digit is taken from the INTEGER-cents
    * rendering (`round(price·100)` is an exact integer in both
    * engines; integer→string is engine-identical — never
    * `floor(log10(x))`, whose FP boundary misclassifies exact powers
    * of ten). The 1..9 digit spine is generated, so absent digits
    * still emit their expected-count row. One map-side-combined
    * 9-group aggregate — trivially 100 TB-safe.
    */
  def benfordAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.t(spark, sfDir, "orders")
    val digits = orders
      .select(substring(round(col("o_totalprice") * 100).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val total = orders.agg(count(lit(1)).as("n"))
    val spine = spark.range(1, 10).select(col("id").cast("int").as("digit"))
    val pBen = log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double"))
    spine.join(digits, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"),
        round(col("n_obs").cast("double") / col("n"), 4).as("p_obs"),
        round(pBen, 4).as("p_benford"),
        round((col("n_obs").cast("double") - col("n") * pBen) *
          (col("n_obs").cast("double") - col("n") * pBen) /
          (col("n") * pBen), 4).as("chi2_contrib"))
      .orderBy("digit")
  }

  // --- c125: market-basket association rules ------------------------

  /** Minimum co-occurrence count for an emitted rule. */
  private[graft] val BasketMinPairN = 10L

  /** c125 — market-basket association rules (Agrawal et al. SIGMOD
    * 1993's support/confidence, lift per Brin et al. 1997 — public):
    * which part BRANDS are ordered together more often than chance?
    * Baskets = orders, items = the order's distinct brands; emit
    * support, directional confidence, and lift for every pair above
    * [[BasketMinPairN]].
    *
    * Scale shape: the pair generator is a SELF-JOIN WITHIN THE
    * BASKET — items are first deduped to (order, brand), then joined
    * on the order key, so the work is Σ basket_size², bounded by the
    * lines-per-order ceiling (TPC-H ≤ 7) — NEVER a global item×item
    * product. Brand marginals are a 25-row broadcast; the part
    * dimension broadcasts into the lineitem scan. One fact shuffle
    * (on orderkey) total.
    *
    * Determinism: counts exact; support/confidence/lift are single
    * IEEE divisions of exact int64 products rounded at 1e-4; output
    * ordered by the (brand_a, brand_b) key, never by a rounded
    * measure.
    */
  def basketLift(spark: SparkSession, sfDir: String): DataFrame = {
    // r18 optimization: ONE basket table (order → sorted distinct
    // brand set, deduped inside the collect_set aggregate) feeds the
    // pair counts, the brand marginals and the basket count, and the
    // within-basket pair generator is a ROW-LOCAL i<j fan over the
    // sorted set (the c196 discipline) instead of an items×items
    // self-join — the old plan evaluated the (lineitem ⋈ part →
    // distinct) chain under four branches and shuffled Σ basket_size²
    // joined rows (measured 3.1 s wall / 13.5 s cpu at sf0.1; guide
    // §2.4). Counts are identical: the fan emits exactly the
    // (brand_a < brand_b) pairs the self-join produced, and the
    // basket-local quadratic stays bounded by the lines-per-order
    // ceiling exactly as before.
    val li = Tables.t(spark, sfDir, "lineitem")
    val part = Tables.t(spark, sfDir, "part")
    val baskets = li.select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("brand"))).as("bs"))
    val nBaskets = baskets.agg(count(lit(1)).as("n_baskets"))
    val brandN = baskets.select(explode(col("bs")).as("brand"))
      .groupBy(col("brand")).agg(count(lit(1)).as("bn"))
    val pairs = baskets
      .where(size(col("bs")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(bs) - 2),
          |  i -> transform(sequence(i + 1, size(bs) - 1),
          |    j -> struct(bs[i] AS brand_a, bs[j] AS brand_b))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.brand_a").as("brand_a"), col("p.brand_b").as("brand_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= BasketMinPairN)
    pairs
      .join(broadcast(brandN.withColumnRenamed("brand", "brand_a")
        .withColumnRenamed("bn", "n_a")), Seq("brand_a"))
      .join(broadcast(brandN.withColumnRenamed("brand", "brand_b")
        .withColumnRenamed("bn", "n_b")), Seq("brand_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("brand_a"), col("brand_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        round(col("n_ab").cast("double") / col("n_baskets"), 4).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 4).as("conf_a_to_b"),
        round(col("n_ab").cast("double") * col("n_baskets") /
          (col("n_a").cast("double") * col("n_b")), 4).as("lift"))
      .orderBy("brand_a", "brand_b")
  }

  // --- c126: windowed funnel ---------------------------------------

  /** Funnel completion window: 7 days from the anchoring view. */
  private[graft] val FunnelWUs = 604800000000L

  /** c126 — windowed funnel (the ClickHouse `windowFunnel` shape —
    * public): per user, the deepest view → click → purchase prefix
    * completed WITHIN 7 DAYS of the anchoring view, maximized over
    * all view anchors. c74's funnel is unconstrained-lifetime; real
    * product funnels expire — "purchased six months after clicking"
    * is not a conversion.
    *
    * Shape — c77's BUCKETIZED non-equi join, not a bare user join:
    * every anchor view carries its 7-day bucket `vts div W`; a
    * qualifying next-stage event at `ts ∈ (anchor, anchor+W]` can
    * only live in bucket `ts div W` or the one before, so the stage
    * side emits TWO probe rows per event and the join key is
    * `(user, bucket)` with the window predicate as residual. Pair
    * work per key is views-in-bucket × stage-events-in-2-buckets —
    * bounded by per-WINDOW activity density, NOT by lifetime per-user
    * history (the bare user-equi join is quadratic in history depth:
    * the 10× deep-history rehearsal measured 266M pair evaluations
    * where this shape touches ~2% of that). Earliest qualifying
    * next-stage collapses by a map-side-combinable min.
    *
    * Determinism: pure integer µs comparisons; depth ∈ {1,2,3} exact.
    */
  /** The c126 stage pipeline, shared with c137's latency key:
    * (anchors v, earliest-click vc, earliest-purchase vcp). */
  private def funnelStages(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val ev = Tables.t(spark, sfDir, "events")
    val e = ev.select(col("user_id"), col("event_type"),
      Tables.tsUs(ev).as("ts"))
    def stage(t: String, as: String) =
      e.where(col("event_type") === t).select(col("user_id"), col("ts").as(as))
    // Anchor side: one row per view, keyed by its own bucket.
    val v = stage("view", "vts")
      .withColumn("bkt", expr(s"vts div $FunnelWUs"))
    // Probe side: each event covers its bucket and the previous one.
    def probed(t: String, as: String) = stage(t, as)
      .withColumn("bkt", explode(array(expr(s"$as div $FunnelWUs"),
        expr(s"$as div $FunnelWUs - 1"))))
    val c = probed("click", "cts")
    val p = probed("purchase", "pts")
    val vc = v.join(c, Seq("user_id", "bkt"))
      .where(col("cts") > col("vts") && col("cts") <= col("vts") + FunnelWUs)
      .groupBy(col("user_id"), col("vts")).agg(min(col("cts")).as("c1"))
    val vcp = vc.withColumn("bkt", expr(s"vts div $FunnelWUs"))
      .join(p, Seq("user_id", "bkt"))
      .where(col("pts") > col("c1") && col("pts") <= col("vts") + FunnelWUs)
      .groupBy(col("user_id"), col("vts"), col("c1"))
      .agg(min(col("pts")).as("p1"))
    (v, vc, vcp)
  }

  def windowFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val (v, vc, vcp) = funnelStages(spark, sfDir)
    v.join(vc.select(col("user_id"), col("vts"), col("c1")),
        Seq("user_id", "vts"), "left")
      .join(vcp.select(col("user_id"), col("vts"), col("p1")),
        Seq("user_id", "vts"), "left")
      .select(col("user_id"),
        (lit(1) + when(col("c1").isNotNull, 1).otherwise(0) +
          when(col("p1").isNotNull, 1).otherwise(0)).as("depth"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_anchors"), max(col("depth")).as("best_depth"))
      .orderBy("user_id")
  }

  // --- c127: largest-remainder budget allocation --------------------

  /** Units to allocate across nations. */
  private[graft] val AllocUnits = 10000L

  /** c127 — largest-remainder (Hamilton) apportionment (public; the
    * method behind seat apportionment and every billing/budget
    * spread): distribute [[AllocUnits]] indivisible units across
    * nations proportionally to customer order revenue — floor shares
    * first, then the leftover units to the largest fractional
    * remainders (nation name as the deterministic tie-break). The
    * operator every cost-attribution/quota pipeline needs the moment
    * "proportional" must sum EXACTLY to the budget.
    *
    * Exactness: revenue travels as integer cents (price·100 rounds to
    * the same exact integer in both engines) summed in DECIMAL(38,0);
    * shares are integer `div`; remainders are exact integers — the
    * whole allocation is integer arithmetic, hash-exact by
    * construction. The windows (total, leftover, remainder rank) run
    * on the 25-row nation aggregate — global single-partition windows
    * on a GROUP-COUNT-sized table, the documented c84/c110 posture.
    */
  def largestRemainderAlloc(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.t(spark, sfDir, "orders")
    val cust = Tables.t(spark, sfDir, "customer")
    val nation = Tables.t(spark, sfDir, "nation")
    val rev = orders
      .join(broadcast(cust.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(round(col("o_totalprice") * 100).cast(DecimalType(38, 0)))
        .as("rev_c"))
    val wAll = Window.partitionBy()
    val alloc = rev
      .withColumn("t_c", sum(col("rev_c")).over(wAll))
      .withColumn("base", expr(s"CAST($AllocUnits AS DECIMAL(38,0)) * rev_c div t_c"))
      .withColumn("rem",
        (lit(AllocUnits).cast(DecimalType(38, 0)) * col("rev_c") -
          col("base").cast(DecimalType(38, 0)) * col("t_c")).cast("long"))
      .withColumn("leftover", lit(AllocUnits) - sum(col("base")).over(wAll))
      .withColumn("rrank", row_number().over(
        wAll.orderBy(col("rem").desc, col("n_name").asc)).cast("long"))
    alloc.select(col("n_name"), col("rev_c").cast("long").as("rev_cents"),
        col("base"),
        (col("base") + when(col("rrank") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy("n_name")
  }

  // --- c128: 2-D Pareto frontier (skyline) --------------------------

  /** c128 — Pareto frontier / skyline (Börzsönyi et al. ICDE 2001's
    * SKYLINE OF — public): the parts no other part beats on BOTH
    * price (lower better) and size (higher better) — the
    * best-value frontier behind "show me the non-dominated options"
    * in any two-criteria ranking.
    *
    * Spark-first shape: the naive skyline is an O(n²) dominance
    * self-join; in 2-D it collapses to ONE SORT + A PREFIX MAX —
    * dedup to distinct (price, size) points, order by (price asc,
    * size desc), keep a point iff its size strictly exceeds the
    * running max over all STRICTLY-preceding rows (those all have
    * price ≤, so a ≥ size there means dominated; equal points were
    * deduped, so the survivor set is exactly the strict-dominance
    * skyline). That is a range-partitionable sort at 100 TB — the
    * classic sort-filter skyline — and the frontier emitted is
    * monotone by construction (audit property: size strictly
    * increases with price along the output).
    *
    * The prefix max itself runs TWO-PASS since round 12 (§5.3 rule 9 —
    * the distinct (price, size) table is catalog-scaled, not
    * constant-sized, so a partition-less window over it is a one-task
    * sort at 100 TB): price-range buckets from the broadcast (min,
    * max) — the [[OrderStats]] bucket map, monotone, so a price never
    * splits buckets — then per-bucket size maxima (map-side combined,
    * ≤ B rows) give each bucket its strictly-prior offset via a tiny
    * self-join, and the within-bucket prefix max runs in a
    * bucket-partitioned window (~ n/B rows per task). Identical
    * survivor set to the single-window form.
    *
    * Determinism: stored doubles compared and grouped bit-exact;
    * counts exact; no arithmetic at all.
    */
  def paretoFrontier(spark: SparkSession, sfDir: String): DataFrame = {
    val B = 1024
    val part = Tables.t(spark, sfDir, "part")
    val pts = part.groupBy(col("p_retailprice").as("price"),
        col("p_size").as("size"))
      .agg(count(lit(1)).as("n_parts"))
    val bounds = pts.agg(min(col("price")).as("blo"), max(col("price")).as("bhi"))
    val bucketed = pts.crossJoin(broadcast(bounds))
      .withColumn("bucket", least(floor((col("price") - col("blo")) /
          (col("bhi") - col("blo") + lit(1e-9)) * B).cast("long"),
        lit(B - 1L)))
      .drop("blo", "bhi")
    val bmax = bucketed.groupBy(col("bucket")).agg(max(col("size")).as("bm"))
    val offsets = bmax.as("a")
      .join(bmax.as("b"), col("b.bucket") < col("a.bucket"), "left")
      .groupBy(col("a.bucket").as("bucket"))
      .agg(max(col("b.bm")).as("boff"))
    val wIn = Window.partitionBy(col("bucket"))
      .orderBy(col("price").asc, col("size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .withColumn("inmax", max(col("size")).over(wIn))
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("runmax", greatest(
        coalesce(col("boff"), lit(Int.MinValue.toLong)),
        coalesce(col("inmax"), lit(Int.MinValue.toLong))))
      .where(col("size") > col("runmax"))
      .select(col("price"), col("size"), col("n_parts"))
      .orderBy("price")
  }

  // --- b79: moving median ------------------------------------------

  /** Trailing window width for the moving median (odd, so the full
    * frame needs no interpolation). */
  private[graft] val MedianFrame = 5

  /** b79 — moving median over a trailing 5-row frame: the ROBUST
    * smoother next to b27's moving average — one fat-fingered order
    * drags a mean for the whole frame, the median shrugs it off.
    * Per customer, ordered by (order date, order key).
    *
    * No engine ships a median WINDOW function with a portable
    * definition, so both sides build it from the same primitive:
    * collect the frame, sort it, take the middle (odd count) or the
    * mean of the two middles (even count — the warm-up rows). The
    * emitted value is EXACT cross-engine without rounding: odd frames
    * emit a stored double verbatim; even frames emit one identical
    * IEEE add-and-halve of two stored doubles.
    *
    * Scale: the frame is O(1) per row (5 elements), the window one
    * hash exchange on the partition key — the same cost class as any
    * b24-family window at 100 TB.
    */
  def movingMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.t(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(-(MedianFrame - 1), 0)
    val frame = sort_array(collect_list(col("o_totalprice")).over(w))
    val n = size(frame)
    val mid = element_at(frame, floor((n + 1) / 2).cast("int"))
    val lo = element_at(frame, floor(n / 2).cast("int"))
    val hi = element_at(frame, (floor(n / 2) + 1).cast("int"))
    val med = when(n % 2 === 1, mid).otherwise((lo + hi) / 2.0)
    orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        med.as("med5"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // --- b80: deterministic mode -------------------------------------

  /** b80 — statistical mode with a deterministic tie-break: the most
    * frequent order priority per market segment (count desc, then
    * priority asc — built-in `mode()` aggregates leave ties
    * engine-private, so the portable form is the count + rank-1
    * window both engines define identically).
    *
    * Shape: the raw join collapses to (segment × priority) counts
    * first (map-side combinable, broadcast customer dim); the rank
    * window runs on that ≤ 25-row table — never on facts.
    */
  def modePriority(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.t(spark, sfDir, "orders")
    val cust = Tables.t(spark, sfDir, "customer")
    val counts = orders
      .join(broadcast(cust.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("n").desc, col("o_orderpriority").asc)))
      .where(col("rn") === 1)
      .select(col("c_mktsegment"), col("o_orderpriority").as("mode_priority"),
        col("n"))
      .orderBy("c_mktsegment")
  }

  // --- c130: dyadic EWMA -------------------------------------------

  /** EWMA window length (16 taps; α = 1/2). */
  private[graft] val EwmaTaps = 16

  /** The tap weights: 2^-(k+1) for k = 0..14, tail-folded 2^-15 for
    * the last tap so the kernel sums to EXACTLY 1. */
  private[graft] def ewmaWeight(k: Int): Double =
    if (k < EwmaTaps - 1) math.pow(2.0, -(k + 1)) else math.pow(2.0, -(EwmaTaps - 1))

  /** c130 — exponentially-weighted moving average with an EXACT
    * dyadic kernel (α = 1/2, 16 taps, tail folded so Σw = 1): the
    * trend smoother behind monitoring dashboards and c113's CUSUM
    * inputs. The recursive EWMA is order-dependent FP; THIS form is
    * a fixed 16-tap FIR over the trailing rows, and with power-of-two
    * weights every product w·x is an EXPONENT SHIFT — exact in IEEE —
    * so the only rounding is the 15 additions, evaluated in the same
    * literal left-to-right order in both engines: the emitted double
    * is bit-identical cross-engine at FULL precision, no tolerance
    * round needed (the b78/c128 stored-double discipline extended to
    * derived arithmetic).
    *
    * Rows with fewer than 16 predecessors are skipped (a partial
    * kernel re-normalizes — a different operator). One lag window per
    * tap over ONE (user) exchange and sort — Catalyst plans all 16
    * `lag`s in a single Window operator.
    */
  def ewmaDyadic(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val base = ev.select(col("user_id"), col("event_id"), col("value"),
      Tables.tsUs(ev).as("ts_us"))
    val lagged = (0 until EwmaTaps).foldLeft(base) { (df, k) =>
      df.withColumn(s"x$k", lag(col("value"), k).over(w))
    }
    val ewma = (0 until EwmaTaps)
      .map(k => col(s"x$k") * lit(ewmaWeight(k)))
      .reduce(_ + _)
    lagged
      .where(col(s"x${EwmaTaps - 1}").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        ewma.as("ewma16"))
      .orderBy("user_id", "event_id")
  }

  // --- c131: session path trigrams ---------------------------------

  /** c131 — behavioral path mining: the frequency of every length-3
    * event-type sequence (consecutive per user in time order) — the
    * sequential-pattern step up from c93's Markov transitions
    * (bigrams): "view→click→purchase" vs "view→error→view" is the
    * difference between a working checkout and a broken one.
    *
    * Shape: two `lead`s over ONE (user) window (single exchange +
    * sort), then a map-side-combined count over the ≤ |types|³ path
    * vocabulary — the result table is bounded by the type vocabulary
    * cubed, independent of corpus size.
    *
    * Determinism: integer counts; share is one division rounded at
    * 1e-4; ordered by the path string itself, never by count.
    */
  def sessionPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val paths = ev
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.tsUs(ev).as("ts_us"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .where(col("t1").isNotNull && col("t2").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t1"), col("t2"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
    val total = paths.agg(sum(col("n")).as("n_total"))
    paths.crossJoin(broadcast(total))
      .select(col("path"), col("n"),
        round(col("n").cast("double") / col("n_total"), 4).as("share"))
      .orderBy("path")
  }

  // --- c132: sharded top-k with deterministic bounds ----------------

  /** Shard count and per-shard published-list length. */
  private[graft] val TopkShards = 8
  private[graft] val TopkM = 20

  /** c132 — communication-efficient distributed top-k with
    * deterministic error bounds (the TPUT / Threshold-Algorithm
    * family — Fagin et al. PODS 2001, Cao & Wang PODC 2004 — public):
    * each of [[TopkShards]] md5-assigned shards publishes only its
    * local top-[[TopkM]] token counts; the coordinator merges the
    * lists into per-candidate LOWER and UPPER bounds (absent shard →
    * 0 lower, that shard's published minimum upper) and a global
    * absent-everywhere ceiling B = Σ_s t_s. This is THE shape a
    * 1000-executor top-k uses when shipping whole vocabularies is off
    * the table: m rows per shard cross the wire, never the long tail,
    * and the bounds tell you exactly when more rounds are needed.
    *
    * Every bound is integer arithmetic over md5-deterministic
    * shards, so the WHOLE protocol hash-verifies cross-engine; the
    * exact global count rides along as the audit column.
    */
  def shardedTopkBounds(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(pmod(conv(substring(md5(concat(lit("shard:"),
        col("doc_id").cast("string"))), 1, 2), 16, 10).cast("long"),
        lit(TopkShards.toLong)).as("shard"), col("w"))
    val counts = toks.groupBy(col("shard"), col("w"))
      .agg(count(lit(1)).as("cnt"))
    val published = counts
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("cnt").desc, col("w").asc)))
      .where(col("rn") <= TopkM)
      .select(col("shard"), col("w"), col("cnt"))
    val thresholds = published.groupBy(col("shard"))
      .agg(min(col("cnt")).as("t_s"))
    val bAll = thresholds.agg(sum(col("t_s")).as("b_ceiling"))
    val candidates = published.select(col("w")).distinct()
    val grid = candidates.crossJoin(broadcast(thresholds))
      .join(published, Seq("shard", "w"), "left")
    val bounds = grid.groupBy(col("w"))
      .agg(sum(coalesce(col("cnt"), lit(0L))).as("lb"),
        sum(coalesce(col("cnt"), col("t_s"))).as("ub"))
    val exact = toks.groupBy(col("w")).agg(count(lit(1)).as("n_exact"))
    bounds.join(exact, Seq("w"))
      .crossJoin(broadcast(bAll))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("lb").desc, col("w").asc)))
      .where(col("rk") <= 10)
      .select(col("w").as("token"), col("lb"), col("ub"), col("n_exact"),
        when(col("lb") >= col("b_ceiling"), 1).otherwise(0).as("certified"))
      .orderBy(col("lb").desc, col("token").asc)
  }

  // --- c133: data-quality expectation audit -------------------------

  /** Order-date sanity bounds for the freshness constraint (µs). */
  private[graft] val OrderDateMinUs = 788918400000000L   // 1995-01-01
  private[graft] val OrderDateMaxUs = 1009843200000000L  // 2002-01-01

  /** c133 — declarative data-quality expectation audit (the
    * Deequ/unit-test-for-data discipline — Schelter et al. VLDB 2018
    * — public): a constraint suite evaluated in ONE pass per table
    * plus one anti-join, emitting (constraint, metric, pass) rows —
    * the gate a 100 TB ingest runs before anything downstream trusts
    * the batch. Constraints: completeness, key uniqueness, domain
    * membership, value bounds, date sanity, referential integrity
    * (orphan custkeys).
    *
    * Shape: all single-table metrics ride one map-side-combined
    * aggregate over orders (count/countDistinct/conditional counts);
    * the referential check is a broadcast anti-join counted. Metrics
    * are exact-integer ratios rounded at 1e-4; `pass` is an integer
    * comparison — hash-exact.
    */
  def expectationAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.t(spark, sfDir, "orders")
    val cust = Tables.t(spark, sfDir, "customer")
    val o = orders.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
    val m = o.agg(
      count(lit(1)).as("n"),
      count(col("o_custkey")).as("n_custkey"),
      countDistinct(col("o_orderkey")).as("n_distinct_key"),
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("n_status_ok"),
      sum(when(col("o_totalprice") > 0.0, 1L).otherwise(0L)).as("n_price_pos"),
      sum(when(col("od_us") >= OrderDateMinUs &&
        col("od_us") < OrderDateMaxUs, 1L).otherwise(0L)).as("n_date_ok"))
    val orphans = o.join(broadcast(cust.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    val t = m.crossJoin(broadcast(orphans))
    def ratio(num: Column): Column = round(num.cast("double") / col("n"), 4)
    t.select(
        ratio(col("n_custkey")).as("r_custkey"),
        ratio(col("n_distinct_key")).as("r_unique"),
        ratio(col("n_status_ok")).as("r_status"),
        ratio(col("n_price_pos")).as("r_price"),
        ratio(col("n_date_ok")).as("r_date"),
        ratio(col("n_orphans")).as("r_orphan"))
      .select(expr(
        s"""stack(6,
           | 'completeness_custkey', r_custkey, CAST(r_custkey >= 1.0 AS INT),
           | 'uniqueness_orderkey', r_unique, CAST(r_unique >= 1.0 AS INT),
           | 'status_in_set',       r_status, CAST(r_status >= 1.0 AS INT),
           | 'price_positive',      r_price,  CAST(r_price >= 1.0 AS INT),
           | 'date_in_range',       r_date,   CAST(r_date >= 1.0 AS INT),
           | 'no_orphan_custkeys',  r_orphan, CAST(r_orphan <= 0.0 AS INT)
           |) AS (check_name, metric, pass)""".stripMargin))
      .select(col("check_name"), col("metric"), col("pass"))
      .orderBy("check_name")
  }

  // --- c134: linear multi-touch attribution -------------------------

  /** c134 — linear multi-touch attribution (the equal-credit
    * complement of c81's last-touch — public marketing-analytics
    * canon): every purchase spreads one unit of credit equally over
    * the user's view/click touches in the trailing 7 days; channels
    * aggregate their credit, and conversions with NO touch land in an
    * explicit `(none)` row so Σ credit + unattributed == conversions
    * EXACTLY (the accounting identity, spec-pinned).
    *
    * Shape: the conversion×touch pairing is c126's bucketized
    * non-equi join — join on `(user, 7d-bucket)` with the lookback as
    * residual, touch side probing (bucket, bucket+1) — so pair work
    * scales with window density. Per-touch credit carries as INTEGER
    * 1e-12 units, `10¹² div n` (the c138 mass discipline — a 1/n
    * DOUBLE quantized to decimal is the engine-divergent cast class:
    * Spark casts the shortest decimal repr, DuckDB the exact binary
    * expansion, and at scale 18 they differ in the last digits);
    * sums are exact integers, the ≤ n·1e-12 floor leak is far below
    * the 1e-4 emission grain.
    */
  def linearAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val e = ev.select(col("user_id"), col("event_id"), col("event_type"),
      Tables.tsUs(ev).as("ts"))
    val conv = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts").as("pts"))
      .withColumn("bkt", expr(s"pts div $FunnelWUs"))
    val touches = e.where(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_type").as("channel"),
        col("ts").as("tts"))
      .withColumn("bkt", explode(array(expr(s"tts div $FunnelWUs"),
        expr(s"tts div $FunnelWUs + 1"))))
    val joined = conv.join(touches, Seq("user_id", "bkt"))
      .where(col("tts") <= col("pts") && col("tts") > col("pts") - FunnelWUs)
      .select(col("conv_id"), col("channel"))
    val credited = joined
      .withColumn("n_t", count(lit(1)).over(
        Window.partitionBy(col("conv_id"))))
      .select(col("conv_id"), col("channel"),
        expr(s"cast($MassScale as bigint) div n_t").as("credit"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("conv_id")).as("n_convs"),
        round(sum(col("credit")).cast("double") / MassScale, 4)
          .as("credit_total"))
    val unattributed = conv.join(joined.select(col("conv_id")).distinct(),
        Seq("conv_id"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("(none)").as("channel"), lit(0L).as("n_touches"),
        col("n").as("n_convs"), lit(0.0).as("credit_total"))
    credited.select(col("channel"), col("n_touches"), col("n_convs"),
        col("credit_total"))
      .unionAll(unattributed)
      .orderBy("channel")
  }

  // --- c135: seasonal hour-of-day baseline --------------------------

  /** c135 — seasonal baseline + anomaly flags (the hour-of-day
    * profile every ops dashboard draws, with day-level 2σ outlier
    * counting): per hour-of-day, the across-days mean and spread of
    * the (day, hour) bucket's TOTAL value, plus how many individual
    * days broke the 2σ band — the seasonal complement of c39's global
    * z-score and c113's sequential CUSUM. The bucket statistic is the
    * TOTAL deliberately: it keeps every moment in EXACT DECIMAL
    * arithmetic end-to-end (a bucket MEAN is a quotient double whose
    * re-quantization to decimal is engine-divergent — Spark casts the
    * shortest decimal repr, DuckDB the exact binary expansion; the
    * c54/c60 bug class), and for traffic monitoring volume×value is
    * the quantity that pages you anyway.
    *
    * Determinism: s_dh = exact DECIMAL(38,6) sum; its square is exact
    * DECIMAL(38,12) (20 digits needed, 38 available — no rounding);
    * moment sums exact; the only doubles are casts OF exact decimals
    * (nearest in both engines) feeding one identical σ expression, so
    * the 2σ anomaly COUNT is exact and stats round at 1e-4.
    */
  def seasonalBaseline(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val b = ev.select(col("value"), Tables.tsUs(ev).as("ts_us"))
      .withColumn("day", expr(s"ts_us div $DayUs"))
      .withColumn("hod", expr("(ts_us div 3600000000) % 24"))
    val dh = b.groupBy(col("day"), col("hod"))
      .agg(sum(col("value").cast(DecimalType(38, 6))).as("s"))
      .select(col("day"), col("hod"), col("s"),
        (col("s") * col("s")).as("s2"))
    val prof = dh.groupBy(col("hod"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("s")).cast("double").as("s1"),
        sum(col("s2")).cast("double").as("sq"))
      .withColumn("mean_h", col("s1") / col("n_days"))
      // n_days = 1 guard: a single-day bucket makes the sample-variance
      // numerator and denominator both 0, and 0/0 is NULL under Spark's
      // non-ANSI division but NaN under DuckDB's IEEE division — the
      // c117 cross-engine divergence class. Emit NULL in BOTH engines
      // (mirrored CASE WHEN in the oracle); the anomaly count then
      // evaluates NULL > band → 0 identically on both sides.
      .withColumn("sd_h", when(col("n_days") > 1,
        sqrt((col("sq") - col("s1") * col("s1") /
          col("n_days")) / (col("n_days") - 1))))
    dh.join(prof, Seq("hod"))
      .groupBy(col("hod"))
      .agg(first(col("n_days")).as("n_days"),
        round(first(col("mean_h")), 4).as("baseline"),
        round(first(col("sd_h")), 4).as("sd"),
        sum(when(abs(col("s").cast("double") - col("mean_h")) >
          lit(2.0) * col("sd_h"), 1L).otherwise(0L)).as("n_anomalous_days"))
      .orderBy("hod")
  }

  // --- b81: ABC / Pareto contribution classification ----------------

  /** b81 — ABC contribution analysis (the Pareto 80/95 inventory
    * classification — public BI canon): brands ranked by revenue,
    * cumulative share, and the A/B/C class cut at 80% / 95% — "which
    * 20% of the catalog carries 80% of the business".
    *
    * Determinism: per-brand revenue is an exact DECIMAL(38,6) sum;
    * the cumulative sum RUNS IN DECIMAL over the deterministic
    * (revenue desc, brand asc) order — never a running double — and
    * only the final share division is FP (identical operands →
    * identical quotient; the class compare evaluates identical
    * doubles against literals). Windows run on the 25-row brand
    * aggregate.
    */
  def abcClassification(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.t(spark, sfDir, "lineitem")
    val part = Tables.t(spark, sfDir, "part")
    val rev = li
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(38, 6))).as("rev_d"))
    val w = Window.orderBy(col("rev_d").desc, col("p_brand").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    rev
      .withColumn("cum_d", sum(col("rev_d")).over(w))
      .withColumn("tot_d", sum(col("rev_d")).over(wAll))
      .withColumn("cum_share",
        col("cum_d").cast("double") / col("tot_d").cast("double"))
      .select(col("p_brand"), col("rev_d").cast("double").as("revenue"),
        round(col("cum_share"), 4).as("cum_share"),
        when(col("cum_share") <= 0.8, "A")
          .when(col("cum_share") <= 0.95, "B")
          .otherwise("C").as("abc_class"))
      .orderBy(col("revenue").desc, col("p_brand").asc)
  }

  // --- b82: sliding distinct-count window ---------------------------

  /** Trailing frame for the sliding distinct count. */
  private[graft] val DistinctFrame = 10

  /** b82 — distinct count over a sliding window: per customer, how
    * many DISTINCT order priorities the trailing 10 orders used — the
    * sliding-cardinality window (neither engine exposes a portable
    * `count(DISTINCT) OVER`, so both sides build it from the same
    * collect → dedup → length primitive, the b79 discipline). O(frame)
    * per row, one hash exchange.
    */
  def windowDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.t(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(-(DistinctFrame - 1), 0)
    orders.select(col("o_custkey"), col("o_orderkey"),
        size(array_distinct(collect_list(col("o_orderpriority")).over(w)))
          .as("n_distinct_prio"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // --- c137: funnel latency percentiles -----------------------------

  /** c137 — funnel time-to-convert, exact order statistics: over
    * every completed view → click → purchase anchor (c126's stage
    * pipeline, shared code), the p50 / p90 of view→purchase latency
    * plus the exact mean — the "how long does conversion take"
    * readout next to c126's "how many convert". Percentiles are the
    * rank-`floor((n−1)p)+1` order statistics over integer µs
    * latencies — exact integers, no interpolation, hash-exact.
    *
    * Scale shape (round 12 — replaces the partition-less rank window
    * the round-11 verdict flagged): the rank-r order statistic only
    * depends on the latency VALUE, so latencies collapse to
    * per-distinct-value tallies first (map-side combined), then
    * [[OrderStats.cumLe]]'s two-pass bucketed cumulative count gives
    * each distinct latency its exact inclusive rank — the value at
    * rank r is min v with cum_le(v) >= r. No single-task sort
    * anywhere; output values are bit-identical to the rank-window
    * form (ties share a value, so tie-break order never reaches the
    * selected VALUE).
    */
  def funnelLatency(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, _, vcp) = funnelStages(spark, sfDir)
    val lat = vcp.select((col("p1") - col("vts")).as("lat_us"))
    val n = lat.agg(count(lit(1)).as("n"),
      sum(col("lat_us").cast(DecimalType(38, 6))).cast("double").as("s"))
    val tallies = lat.groupBy(col("lat_us").as("v"))
      .agg(count(lit(1)).as("cnt"))
    OrderStats.cumLe(tallies, Nil, Nil)
      .crossJoin(broadcast(n))
      .groupBy(col("n"))
      .agg(min(when(
          col("cum_le") >= expr("cast(floor((n - 1) * 0.5) as bigint) + 1"),
          col("v"))).as("p50_us"),
        min(when(
          col("cum_le") >= expr("cast(floor((n - 1) * 0.9) as bigint) + 1"),
          col("v"))).as("p90_us"),
        first(round(col("s") / col("n") / 1000000.0, 4)).as("mean_s"))
      .select(col("n").as("n_conversions"), col("p50_us"), col("p90_us"),
        col("mean_s"))
  }

  // --- c138: Markov stationary distribution -------------------------

  /** Power-iteration rounds and the integer mass scale. */
  private[graft] val StationaryRounds = 8
  private[graft] val MassScale = 1000000000000L // 1e12

  /** c138 — stationary distribution of the behavioral Markov chain
    * (the long-run "where do users spend their time" vector c93's
    * one-step transition matrix implies; Perron–Frobenius / power
    * iteration — public): [[StationaryRounds]] unrolled rounds of
    * π' = πP starting uniform.
    *
    * ALL-INTEGER power iteration: π carries as integer units of
    * 1e-12 mass; each round computes `Σ_i (π_i · n_ij) div n_i` —
    * integer floor-division per term (deterministic in both engines;
    * the ≤ 5e-12 per-round floor leak is documented and far below the
    * emitted 1e-4 grain). The chain state is 5 rows; each round is a
    * broadcast join on the 25-row count matrix — the same unrolled
    * fixed-round discipline as c35/c68/c78.
    */
  def markovStationary(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val trans = ev
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.tsUs(ev).as("ts_us"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .where(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("n_ij"))
    val rowTotals = trans.groupBy(col("cur")).agg(sum(col("n_ij")).as("n_i"))
    val matrix = trans.join(rowTotals, Seq("cur"))
    val states = rowTotals.select(col("cur").as("state"))
    val nStates = 5L
    val init = states.select(col("state"),
      lit(MassScale / nStates).as("mass"))
    val eventual = (1 to StationaryRounds).foldLeft(init) { (pi, _) =>
      pi.join(broadcast(matrix), col("state") === col("cur"))
        .select(col("nxt").as("state"),
          expr("mass * n_ij div n_i").as("contrib"))
        .groupBy(col("state")).agg(sum(col("contrib")).as("mass"))
    }
    eventual
      .select(col("state"),
        round(col("mass").cast("double") / MassScale, 4).as("pi"))
      .orderBy("state")
  }

  // --- b83: forward as-of join --------------------------------------

  /** b83 — FORWARD as-of join: for each click, the EARLIEST purchase
    * by the same user at-or-after it — the directional complement of
    * b14's backward as-of (market data looks back, conversion
    * analysis looks forward: "what did this click lead to"). Same
    * portable idiom as b14: equi+range join, `row_number()=1` under a
    * total order, identical formulation in both engines (never
    * DuckDB's native ASOF, whose forward direction isn't portable).
    */
  def asofForward(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val e = ev.select(col("event_id"), col("user_id"), col("event_type"),
      Tables.tsUs(ev).as("ts_us"))
    val clicks = e.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_us").as("click_ts_us"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("puser"),
        col("ts_us").as("purchase_ts_us"))
    val w = Window.partitionBy(col("click_id"))
      .orderBy(col("purchase_ts_us").asc, col("purchase_id").asc)
    clicks
      .join(purchases, col("user_id") === col("puser") &&
        col("purchase_ts_us") >= col("click_ts_us"), "left")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("click_id"), col("user_id"), col("click_ts_us"),
        col("purchase_id"), col("purchase_ts_us"))
      .orderBy("click_id")
  }

  // --- c139: OHLC bars ----------------------------------------------

  /** c139 — OHLC candle bars (the finance/monitoring resample: per
    * hour, the Open/High/Low/Close of `value` plus count and exact
    * total). Open/Close are first/last BY THE TOTAL ORDER
    * `(ts, event_id)` via the b78 min/max-of-struct trick — one
    * map-side-combinable aggregate, never a window — so the bar
    * build is a single shuffle by hour at any volume; High/Low are
    * plain min/max of stored doubles.
    */
  def tumblingOhlc(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val e = ev.select(col("value"), col("event_id"),
        Tables.tsUs(ev).as("ts_us"))
      .withColumn("hour", expr("ts_us div 3600000000"))
    e.groupBy(col("hour"))
      .agg(min(struct(col("ts_us"), col("event_id"), col("value"))).as("o"),
        max(struct(col("ts_us"), col("event_id"), col("value"))).as("c"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        count(lit(1)).as("n_events"),
        Canon.dsum(col("value")).as("volume"))
      .select(col("hour"), col("o.value").as("open"), col("high"),
        col("low"), col("c.value").as("close"), col("n_events"),
        col("volume"))
      .orderBy("hour")
  }

  // --- c140: period-over-period movers ------------------------------

  /** c140 — period-over-period movers (the WoW/MoM delta table behind
    * every "what changed" dashboard): the event span is split at its
    * integer midpoint day and each event type's exact-decimal value
    * total is compared across the halves — delta exact, percent
    * change one guarded IEEE division rounded at 1e-4. The boundary
    * is integer arithmetic over the 1-row global bounds broadcast;
    * everything else is one conditional aggregate.
    */
  def periodMovers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val e = ev.select(col("event_type"), col("value"),
        Tables.tsUs(ev).as("ts_us"))
      .withColumn("day", expr(s"ts_us div $DayUs"))
    val bounds = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(expr("d0 + (d1 - d0 + 1) div 2").as("mid"))
    val halves = e.crossJoin(broadcast(bounds))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("day") < col("mid"),
          col("value").cast(DecimalType(38, 6)))).cast("double").as("v1"),
        sum(when(col("day") >= col("mid"),
          col("value").cast(DecimalType(38, 6)))).cast("double").as("v2"),
        sum(when(col("day") < col("mid"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("day") >= col("mid"), 1L).otherwise(0L)).as("n2"))
    halves.select(col("event_type"), col("n1"), col("n2"),
        round(col("v1"), 4).as("v1"), round(col("v2"), 4).as("v2"),
        round(col("v2") - col("v1"), 4).as("delta"),
        when(col("v1") > 0.0, round((col("v2") - col("v1")) / col("v1"), 4))
          .as("pct_change"))
      .orderBy("event_type")
  }

  // --- c141: new vs returning users ---------------------------------

  /** c141 — new-vs-returning daily split (the product-analytics
    * acquisition/retention headline): per day, active users, users
    * whose FIRST-EVER activity is that day, and the returning
    * remainder. First-activity day is one map-side-combinable min per
    * user; the daily roll-up joins day-grain aggregates only. All
    * integer counts — hash-exact.
    */
  def newVsReturning(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val e = ev.select(col("user_id"), Tables.tsUs(ev).as("ts_us"))
      .withColumn("day", expr(s"ts_us div $DayUs"))
    val userDays = e.select(col("user_id"), col("day")).distinct()
    val firstDay = userDays.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
    userDays.join(firstDay, Seq("user_id"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("n_new"))
      .select(col("day"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"))
      .orderBy("day")
  }

  // --- c142: A/B test power analysis --------------------------------

  /** z-quantiles for α=0.05 two-sided and 80% power (literal in both
    * engines). */
  private val ZAlpha = 1.959963984540054
  private val ZBeta = 0.8416212335729143

  /** c142 — proportions-test power analysis (the closed-form
    * two-proportion sample-size formula — Fleiss et al. / standard
    * biostatistics, public): for each event type, given c122's
    * OBSERVED conversion rates, the per-arm n required to detect the
    * observed delta at α=0.05 / 80% power, and whether the current
    * arm is already that large — the "is this experiment even powered"
    * readout that should gate every c122/c90 significance claim.
    *
    * n = (z_{α/2}·√(2p̄q̄) + z_β·√(p₁q₁+p₂q₂))² / δ² — one IEEE
    * expression over exact-integer-derived rates with literal
    * quantiles, NULL on δ=0, ceiling to an integer (identical
    * doubles → identical ceil in both engines).
    */
  def powerAnalysis(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val firsts = ev
      .select(col("user_id"), col("event_type"), col("value"),
        Tables.tsUs(ev).as("ts_us"), col("event_id"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(struct(col("ts_us"), col("event_id"), col("value"))).as("f"))
      .select(col("user_id"), col("event_type"),
        (col("f.value") > ConvCut).as("conv"))
      .withColumn("a", userArmA(col("user_id")))
    val t = firsts.groupBy(col("event_type"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("a") && col("conv"), 1L).otherwise(0L)).as("conv_a"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("a") && col("conv"), 1L).otherwise(0L)).as("conv_b"))
    val p1 = col("conv_a").cast("double") / col("n_a")
    val p2 = col("conv_b").cast("double") / col("n_b")
    val pbar = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val delta = p1 - p2
    val nReq = (lit(ZAlpha) * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar)) +
      lit(ZBeta) * sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2)))
    t.select(col("event_type"), col("n_a"), col("n_b"),
        round(p1, 4).as("rate_a"), round(p2, 4).as("rate_b"),
        when(delta =!= 0.0,
          ceil(nReq * nReq / (delta * delta)).cast("long")).as("n_required"),
        when(delta =!= 0.0,
          when(least(col("n_a"), col("n_b")).cast("double") >=
            ceil(nReq * nReq / (delta * delta)), 1).otherwise(0))
          .as("powered"))
      .orderBy("event_type")
  }

  // --- c144: cohort LTV curves --------------------------------------

  /** c144 — cohort lifetime-value curves (the growth-analytics
    * "revenue by cohort age" matrix behind every payback-period
    * decision; extends c75's retention COUNTS to VALUE): users cohort
    * by first-activity day; per (cohort, age-in-days) the exact
    * per-period value total and its running cumulative — the LTV
    * curve — plus the cohort's user count.
    *
    * Determinism: first-day and age are integer µs-div arithmetic;
    * period totals are exact DECIMAL(38,6) sums and the cumulative
    * RUNS IN DECIMAL over the (cohort, age) order (the b81
    * discipline); emission rounds at the 1e-6 quantization grain
    * (identity-safe, Canon.rsum6). Shape: first-day is one map-side
    * min per user; the curve table is (cohorts × ages)-sized.
    */
  def cohortLtv(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val e = ev.select(col("user_id"), col("value"),
        Tables.tsUs(ev).as("ts_us"))
      .withColumn("day", expr(s"ts_us div $DayUs"))
    val firstDay = e.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort"))
    val sizes = firstDay.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_users"))
    val curve = e.join(firstDay, Seq("user_id"))
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("age"))
      .agg(sum(col("value").cast(DecimalType(38, 6))).as("pv_d"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("age").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    curve
      .withColumn("cum_d", sum(col("pv_d")).over(w))
      .join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort"), col("age"), col("n_users"),
        round(col("pv_d").cast("double"), 6).as("period_value"),
        round(col("cum_d").cast("double"), 6).as("cum_value"))
      .orderBy("cohort", "age")
  }

  // --- c145: power-of-two gap histogram -----------------------------

  /** c145 — logarithmic inter-event gap histogram (the
    * HdrHistogram-style latency summary — power-of-two buckets over
    * per-user inter-arrival seconds): the distribution-shaped
    * companion to c116's burstiness scalar. The bucket index is an
    * EXACT INTEGER log2 via the c119 rho trick — `length(bin(x)) − 1`
    * — never `floor(log2(x))`, whose FP boundary misclassifies exact
    * powers of two. One user window for the gaps, one map-side
    * aggregate over a ≤ ~40-row bucket vocabulary.
    */
  def gapHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val gaps = ev.select(col("user_id"), col("event_id"),
        Tables.tsUs(ev).as("ts_us"))
      .withColumn("prev", lag(col("ts_us"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(expr("(ts_us - prev) div 1000000").as("gap_s"))
      .where(col("gap_s") >= 1L)
    val bucketed = gaps
      .select((length(bin(col("gap_s"))) - 1).cast("int").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val total = bucketed.agg(sum(col("n")).as("n_total"))
    bucketed.crossJoin(broadcast(total))
      .select(col("bucket"),
        expr("shiftleft(cast(1 as bigint), bucket)").as("gap_from_s"),
        expr("shiftleft(cast(1 as bigint), bucket + 1) - 1").as("gap_to_s"),
        col("n"), round(col("n").cast("double") / col("n_total"), 4)
          .as("share"))
      .orderBy("bucket")
  }

  // --- c146: CUPED variance reduction -------------------------------

  /** c146 — CUPED covariate adjustment (Deng et al. WSDM 2013 —
    * public; the variance-reduction step every mature experimentation
    * platform applies before c90/c122 read out): per-user PRE-period
    * value is the covariate X, POST-period value the metric Y; θ =
    * cov(X,Y)/var(X) from EXACT moment sums, adjusted arm means
    * Ȳ − θ(X̄_arm − X̄), and the variance-reduction fraction ρ².
    *
    * Exactness: X and Y stay DECIMAL(38,6) per user (zero-filled);
    * their products are EXACT DECIMAL(38,12) (≈26 digits needed, 38
    * available) and every moment is an exact decimal sum — the
    * c135 discipline, so θ is one IEEE expression over casts OF exact
    * decimals, identical cross-engine, rounded at 1e-4. The per-user
    * collapse is one map-side-combinable conditional aggregate; the
    * moment pass runs on user-count rows.
    */
  def cupedAdjustment(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val e = ev.select(col("user_id"), col("value"),
        Tables.tsUs(ev).as("ts_us"))
      .withColumn("day", expr(s"ts_us div $DayUs"))
    val bounds = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(expr("d0 + (d1 - d0 + 1) div 2").as("mid"))
    val perUser = e.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(col("day") < col("mid"),
          col("value").cast(DecimalType(38, 6)))),
          lit(0).cast(DecimalType(38, 6))).as("x"),
        coalesce(sum(when(col("day") >= col("mid"),
          col("value").cast(DecimalType(38, 6)))),
          lit(0).cast(DecimalType(38, 6))).as("y"))
      .withColumn("a", userArmA(col("user_id")))
    val m = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("y") * col("y")).cast("double").as("syy"),
      sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("a"), col("x"))).cast("double").as("sx_a"),
      sum(when(col("a"), col("y"))).cast("double").as("sy_a"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("a"), col("x"))).cast("double").as("sx_b"),
      sum(when(!col("a"), col("y"))).cast("double").as("sy_b"))
    val covXY = col("sxy") - col("sx") * col("sy") / col("n")
    val varX = col("sxx") - col("sx") * col("sx") / col("n")
    val varY = col("syy") - col("sy") * col("sy") / col("n")
    // varX = 0 guard (the c122 denom>0 discipline): a single-day corpus
    // makes the pre-period empty, every x = 0, varX = 0 exactly — Spark's
    // non-ANSI 0/0 is NULL but DuckDB's IEEE division is NaN. Emit NULL
    // in BOTH engines (mirrored CASE WHEN in the oracle); a NULL theta
    // propagates NULL adjusted means, the honest "no covariate" readout.
    val theta = when(varX > 0, covXY / varX)
    val xbar = col("sx") / col("n")
    m.select(col("n"), col("n_a"), col("n_b"),
        round(theta, 4).as("theta"),
        round(col("sy_a") / col("n_a") -
          theta * (col("sx_a") / col("n_a") - xbar), 4).as("adj_mean_a"),
        round(col("sy_b") / col("n_b") -
          theta * (col("sx_b") / col("n_b") - xbar), 4).as("adj_mean_b"),
        round(when(varX > 0 && varY > 0,
          covXY * covXY / (varX * varY)), 4).as("var_reduction"))
  }

  // --- c147: difference-in-differences ------------------------------

  /** c147 — difference-in-differences estimator (the econometrics
    * 2×2 — public canon; the observational complement of the
    * randomized c90/c146 readouts): arm × period cell means of event
    * value, and DiD = (B,post − B,pre) − (A,post − A,pre). Period
    * splits at the integer midpoint day (the c140 bounds broadcast);
    * cell sums are exact decimals and counts exact integers, so the
    * estimate is one IEEE expression over identical operands, rounded
    * at 1e-4. Output: the four cell means + the estimate, one row.
    */
  def didEstimator(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val e = ev.select(col("user_id"), col("value"),
        Tables.tsUs(ev).as("ts_us"))
      .withColumn("day", expr(s"ts_us div $DayUs"))
      .withColumn("a", userArmA(col("user_id")))
    val bounds = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(expr("d0 + (d1 - d0 + 1) div 2").as("mid"))
    def cell(arm: Column, post: Boolean) = {
      val inPeriod = if (post) col("day") >= col("mid")
        else col("day") < col("mid")
      (sum(when(arm && inPeriod, col("value").cast(DecimalType(38, 6))))
        .cast("double"),
        sum(when(arm && inPeriod, 1L).otherwise(0L)))
    }
    val (saPre, naPre) = cell(col("a"), post = false)
    val (saPost, naPost) = cell(col("a"), post = true)
    val (sbPre, nbPre) = cell(!col("a"), post = false)
    val (sbPost, nbPost) = cell(!col("a"), post = true)
    val m = e.crossJoin(broadcast(bounds)).agg(
      saPre.as("sa_pre"), naPre.as("na_pre"),
      saPost.as("sa_post"), naPost.as("na_post"),
      sbPre.as("sb_pre"), nbPre.as("nb_pre"),
      sbPost.as("sb_post"), nbPost.as("nb_post"))
    def mean(s: String, n: String) = col(s) / col(n)
    m.select(
      round(mean("sa_pre", "na_pre"), 4).as("mean_a_pre"),
      round(mean("sa_post", "na_post"), 4).as("mean_a_post"),
      round(mean("sb_pre", "nb_pre"), 4).as("mean_b_pre"),
      round(mean("sb_post", "nb_post"), 4).as("mean_b_post"),
      round((mean("sb_post", "nb_post") - mean("sb_pre", "nb_pre")) -
        (mean("sa_post", "na_post") - mean("sa_pre", "na_pre")), 4)
        .as("did_estimate"))
  }

  // --- c148: winsorized mean ----------------------------------------

  /** Winsorization tail fraction (5% each side). */
  private[graft] val WinsorP = 0.05

  /** c148 — winsorized mean (the metric-engineering staple — public;
    * clamp to the [p5, p95] order statistics, then average: the
    * outlier-robust metric c90-family tests SHOULD run on when value
    * is heavy-tailed): per event type, the exact p5/p95 order
    * statistics (rank `floor((n−1)p)+1`, the c137 discipline), the
    * clamped exact-decimal mean, and how many values each side
    * clamped.
    *
    * Determinism: cut points are STORED doubles selected by integer
    * rank; clamping compares identical doubles; the mean is a
    * [[Canon.davgFloor6]]-style floored exact-decimal average (no
    * round-tie hazard).
    *
    * Scale shape (round 12 — replaces the 5-partition rank window the
    * round-11 verdict flagged): a rank-selected cut point depends only
    * on the VALUE, so values collapse to per-(type, value) tallies
    * (map-side combined) and [[OrderStats.cumLe]]'s bucketed two-pass
    * cumulative count locates each cut as min v with cum_le >= rank —
    * no events/5-sized single-task sort; outputs are bit-identical to
    * the rank-window form.
    */
  def winsorizedMean(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val e = ev.select(col("event_type"), col("value"))
    val nPerType = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tallies = e.groupBy(col("event_type"), col("value").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val cuts = OrderStats.cumLe(tallies, Seq("event_type"), Nil)
      .join(broadcast(nPerType), "event_type")
      .withColumn("lo_rk", expr(s"cast(floor((n - 1) * $WinsorP) as bigint) + 1"))
      .withColumn("hi_rk",
        expr(s"cast(floor((n - 1) * ${1.0 - WinsorP}) as bigint) + 1"))
      .groupBy(col("event_type"))
      .agg(min(when(col("cum_le") >= col("lo_rk"), col("v"))).as("p_lo"),
        min(when(col("cum_le") >= col("hi_rk"), col("v"))).as("p_hi"),
        first(col("n")).as("n"))
    e.join(broadcast(cuts), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n"),
        first(col("p_lo")).as("p_lo"), first(col("p_hi")).as("p_hi"),
        sum(when(col("value") < col("p_lo"), 1L).otherwise(0L))
          .as("n_clamped_low"),
        sum(when(col("value") > col("p_hi"), 1L).otherwise(0L))
          .as("n_clamped_high"),
        Canon.davgFloor6(
          greatest(col("p_lo"), least(col("p_hi"), col("value"))),
          count(lit(1))).as("winsorized_mean"))
      .orderBy("event_type")
  }

  // --- b84/b85: multiset set operations ------------------------------

  /** b84 — EXCEPT ALL (bag difference): B33's EXCEPT removes
    * duplicates; the MULTISET form subtracts occurrence counts —
    * the reconciliation semantics a row-count-preserving diff needs
    * ("three loads of the same row minus two acknowledgements leaves
    * ONE unmatched"). Spark `exceptAll` and SQL `EXCEPT ALL` share
    * the standard's definition, so the operator maps 1:1. Exercised
    * on order priorities of two overlapping revenue bands — genuine
    * duplicate multiplicities on both sides.
    */
  def exceptAll(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.t(spark, sfDir, "orders")
    val hi = orders.where(col("o_totalprice") > 200000.0)
      .select(col("o_orderpriority"), col("o_orderstatus"))
    val vhi = orders.where(col("o_totalprice") > 350000.0)
      .select(col("o_orderpriority"), col("o_orderstatus"))
    hi.exceptAll(vhi)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority", "o_orderstatus")
  }

  /** b85 — INTERSECT ALL (bag intersection): min of the two sides'
    * occurrence counts per row — B32's INTERSECT is the distinct
    * form. Same 1:1 standard mapping as b84. */
  def intersectAll(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.t(spark, sfDir, "orders")
    val hi = orders.where(col("o_totalprice") > 200000.0)
      .select(col("o_orderpriority"), col("o_orderstatus"))
    val early = orders.where(unix_micros(col("o_orderdate")
        .cast("timestamp")) < OrderDateMaxUs - 2L * 365L * DayUs)
      .select(col("o_orderpriority"), col("o_orderstatus"))
    hi.intersectAll(early)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority", "o_orderstatus")
  }

  // --- c151: Lorenz curve --------------------------------------------

  /** c151 — Lorenz curve by user decile (the CURVE behind c110's Gini
    * scalar — "the top decile holds X% of the value"): users ranked
    * by total value, cut into 10 equal-count buckets by exact integer
    * rank, each bucket's exact-decimal value share and the running
    * cumulative — IN DECIMAL (the b81 discipline) — emitted at 1e-4.
    *
    * Scale shape (round 12 — replaces the all-users partition-less
    * rank window the round-11 verdict flagged): equal-COUNT deciles
    * need each user's exact global rank (a boundary can fall inside a
    * run of tied values, where only the user_id tie-break splits it),
    * so the rank comes from [[OrderStats.cumLe]] with cnt = 1 and the
    * user_id tie column — a B-way value-range-partitioned sort, never
    * one task. The 10-row decile table then cumulates via a tiny
    * self-join (the c28 idiom) and the total rides a 1-row broadcast —
    * the final plan has NO partition-less window at all. Outputs are
    * bit-identical to the rank-window form.
    */
  def lorenzCurve(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val perUser = ev.select(col("user_id"), col("value"))
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast(DecimalType(38, 6))).as("v"))
    val nTot = perUser.agg(count(lit(1)).as("n"),
      sum(col("v")).as("tot"))
    val ranked = OrderStats.cumLe(perUser.withColumn("cnt", lit(1L)),
        Nil, Seq("user_id"))
      .crossJoin(broadcast(nTot.select(col("n"))))
      .withColumn("decile", expr("((cum_le - 1) * 10) div n"))
    val buckets = ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("v")).as("bv"))
    buckets.as("a")
      .join(buckets.as("b"), col("b.decile") <= col("a.decile"))
      .groupBy(col("a.decile").as("decile"), col("a.n_users").as("n_users"),
        col("a.bv").as("bv"))
      .agg(sum(col("b.bv")).as("cum"))
      .crossJoin(broadcast(nTot.select(col("tot"))))
      .select(col("decile"), col("n_users"),
        round(col("bv").cast("double") / col("tot").cast("double"), 4)
          .as("share"),
        round(col("cum").cast("double") / col("tot").cast("double"), 4)
          .as("cum_share"))
      .orderBy("decile")
  }

  // --- c152: DAU/MAU stickiness --------------------------------------

  /** Trailing window for the MAU denominator (days). */
  private[graft] val MauDays = 30L

  /** c152 — DAU/MAU stickiness (THE product-analytics engagement
    * ratio): per active day, distinct daily actives over distinct
    * 30-day-trailing actives. The sliding DISTINCT denominator can't
    * ride a plain window (cardinality isn't subtractable), so the
    * scale shape is: collapse events to the (user, day) grain FIRST,
    * then fan that DAY-GRAIN table (tiny vs events) ≤30× against the
    * active-day spine and count distinct per day — the standard
    * day-grain×window fan-out, never an events-sized one. All-integer
    * counts; one rounded ratio.
    */
  def dauMau(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val userDays = ev.select(col("user_id"), Tables.tsUs(ev).as("ts_us"))
      .withColumn("day", expr(s"ts_us div $DayUs"))
      .select(col("user_id"), col("day")).distinct()
    val dau = userDays.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val spine = userDays.select(col("day")).distinct()
      .withColumnRenamed("day", "d")
    val mau = spine.join(userDays,
        col("day") > col("d") - MauDays && col("day") <= col("d"))
      .select(col("d"), col("user_id")).distinct()
      .groupBy(col("d")).agg(count(lit(1)).as("mau"))
    dau.join(mau, col("day") === col("d"))
      .select(col("day"), col("dau"), col("mau"),
        round(col("dau").cast("double") / col("mau"), 4).as("stickiness"))
      .orderBy("day")
  }

  // --- registry ----------------------------------------------------

  /** c183 bin count, and the ONE machine-generated WOE formula text
    * that feeds BOTH engines (the a18/c78/c171 shared-spec
    * discipline): Laplace-smoothed log-odds of the bin's event share
    * vs its non-event share. Inputs are integer counts, so the
    * expression is engine-identical up to the shared `ln`.
    */
  private[graft] val WoeBins = 10
  // CAST ... AS DOUBLE before the +0.5: a bare `n_pos + 0.5` promotes
  // BIGINT + DECIMAL(1,1) to DECIMAL arithmetic whose division SCALE
  // rules are engine-specific (measured: a 7th-decimal drift that
  // flipped one r4 rounding at sf0.1); all-double keeps both engines
  // on identical IEEE ops.
  private[graft] val woeSql: String =
    "ln(((CAST(n_pos AS DOUBLE) + 0.5) / pos_tot) / ((CAST(n_neg AS DOUBLE) + 0.5) / neg_tot))"
  private[graft] val ivSql: String =
    s"(CAST(n_pos AS DOUBLE) / pos_tot - CAST(n_neg AS DOUBLE) / neg_tot) * ($woeSql)"

  /** c183 — WEIGHT-OF-EVIDENCE feature binning (the credit-scoring /
    * feature-engineering classic — Siddiqi's scorecard formulation,
    * public): bin a numeric feature, score each bin by the
    * log-odds of event vs non-event concentration (WOE), and weight
    * the per-bin divergence into the feature's Information Value —
    * the "is this feature predictive, and where" audit a training
    * pipeline runs before model fitting. Feature = order total
    * price; event = urgent priority.
    *
    * Determinism at the bin boundary is the whole trick: bins are
    * EQUAL-WIDTH over exact integer cents ((cents − lo) div width,
    * width = (hi − lo) div 10 + 1 — pure integer arithmetic, no FP
    * boundary can move a row between engines; the quantile-binned
    * variant would need a global sort the c28 histogram path
    * deliberately avoids). Scale shape: one scan + a 2-value
    * min/max broadcast + a ≤10-group map-side-combined aggregate;
    * the WOE/IV math runs on the 10-row bin table.
    */
  def woeBinning(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.t(spark, sfDir, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"),
        (col("o_orderpriority") === "1-URGENT").as("pos"))
    val bounds = o.agg(min("cents").as("lo"), max("cents").as("hi"))
    val agg = o.crossJoin(broadcast(bounds))
      .select(expr(s"(cents - lo) div ((hi - lo) div $WoeBins + 1)").as("bin"),
        col("pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"))
    val tot = agg.agg(sum(col("n_pos")).as("pos_tot"), sum(col("n_neg")).as("neg_tot"))
    agg.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("n_pos"), col("n_neg"),
        round(expr(woeSql), 4).as("woe"),
        round(expr(ivSql), 4).as("iv"))
      .orderBy("bin")
  }

  /** c184 embargo width DENOMINATOR: the dropped band is
    * (hi − lo) div 20 — 5% of the observed span, integer µs — so the
    * band is non-vacuous at every fixture SF (a fixed 1-hour band
    * measured empty at sf0.001, where the mean event gap is ~43 min).
    * In production the width is the autocorrelation/label horizon;
    * the span-proportional default is the fixture-safe stand-in.
    */
  private[graft] val EmbargoDen = 20

  /** c184 — TEMPORAL train/test split with an EMBARGO gap (the purged
    * time split of financial ML — López de Prado's purging/embargo,
    * public — and of any forecasting eval): a hash split (c32) is
    * WRONG for time-ordered data because train rows later than the
    * test window leak the future, and rows immediately before the
    * cut leak through autocorrelation/session overlap; the fix is a
    * time cut PLUS a dropped embargo band just before it. Completes
    * the leakage-control family: c32 (iid hash), c168 (near-dup
    * cluster-safe), this (temporal).
    *
    * Determinism: the cut is lo + (hi−lo)·4 div 5 and the embargo
    * band [cut − (hi−lo) div [[EmbargoDen]], cut) — pure integer µs
    * arithmetic on the min/max broadcast, no FP anywhere. Scale
    * shape: one scan + a 2-value broadcast + a 3-group aggregate;
    * the split column composes with any training-set scan as a
    * pushed-down predicate.
    */
  def temporalSplitEmbargo(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
    val e = ev.select(col("user_id"), Tables.tsUs(ev).as("ts_us"))
    val bounds = e.agg(min("ts_us").as("lo"), max("ts_us").as("hi"))
    e.crossJoin(broadcast(bounds))
      .withColumn("cut", expr("lo + ((hi - lo) * 4) div 5"))
      .withColumn("emb", expr(s"(hi - lo) div $EmbargoDen"))
      .withColumn("split",
        when(col("ts_us") >= col("cut"), lit("test"))
          .when(col("ts_us") >= col("cut") - col("emb"), lit("embargo_dropped"))
          .otherwise(lit("train")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min("ts_us").as("min_ts_us"), max("ts_us").as("max_ts_us"))
      .orderBy("split")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c184_temporal_split_embargo" -> (temporalSplitEmbargo(_, _)),
    "c183_woe_binning" -> (woeBinning(_, _)),
    "b77_interval_coalesce" -> (intervalCoalesce(_, _)),
    "b78_resample_ffill" -> (resampleFfill(_, _)),
    "c121_kmv_pair_overlap" -> (kmvPairOverlap(_, _)),
    "c122_chi2_proportions" -> (chi2Proportions(_, _)),
    "c123_mann_whitney_u" -> (mannWhitneyU(_, _)),
    "c124_benford_audit" -> (benfordAudit(_, _)),
    "c125_basket_lift" -> (basketLift(_, _)),
    "c126_window_funnel" -> (windowFunnel(_, _)),
    "c127_largest_remainder_alloc" -> (largestRemainderAlloc(_, _)),
    "c128_pareto_frontier" -> (paretoFrontier(_, _)),
    "b79_moving_median" -> (movingMedian(_, _)),
    "b80_mode_priority" -> (modePriority(_, _)),
    "c130_ewma_dyadic" -> (ewmaDyadic(_, _)),
    "c131_session_paths" -> (sessionPaths(_, _)),
    "c132_sharded_topk_bounds" -> (shardedTopkBounds(_, _)),
    "c133_expectation_audit" -> (expectationAudit(_, _)),
    "c134_linear_attribution" -> (linearAttribution(_, _)),
    "c135_seasonal_baseline" -> (seasonalBaseline(_, _)),
    "b81_abc_classification" -> (abcClassification(_, _)),
    "b82_window_distinct" -> (windowDistinct(_, _)),
    "c137_funnel_latency" -> (funnelLatency(_, _)),
    "c138_markov_stationary" -> (markovStationary(_, _)),
    "b83_join_asof_forward" -> (asofForward(_, _)),
    "c139_tumbling_ohlc" -> (tumblingOhlc(_, _)),
    "c140_period_movers" -> (periodMovers(_, _)),
    "c141_new_vs_returning" -> (newVsReturning(_, _)),
    "c142_power_analysis" -> (powerAnalysis(_, _)),
    "c144_cohort_ltv" -> (cohortLtv(_, _)),
    "c145_gap_histogram" -> (gapHistogram(_, _)),
    "c146_cuped_adjustment" -> (cupedAdjustment(_, _)),
    "c147_did_estimator" -> (didEstimator(_, _)),
    "c148_winsorized_mean" -> (winsorizedMean(_, _)),
    "b84_except_all" -> (exceptAll(_, _)),
    "b85_intersect_all" -> (intersectAll(_, _)),
    "c151_lorenz_curve" -> (lorenzCurve(_, _)),
    "c152_dau_mau" -> (dauMau(_, _)))

  /** c138's oracle: the unrolled integer power iteration as
    * machine-generated CTE rounds (the c78 discipline). */
  private def stationarySql: String = {
    val rounds = (1 to StationaryRounds).map { r =>
      val prev = if (r == 1) "pi0" else s"pi${r - 1}"
      s"""pi$r AS (
         |  SELECT nxt AS state, CAST(SUM((mass * n_ij) // n_i) AS BIGINT)
         |    AS mass
         |  FROM $prev p JOIN matrix m ON p.state = m.cur
         |  GROUP BY nxt
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH seq AS (
       |  SELECT event_type AS cur,
       |    lead(event_type, 1) OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts) ASC, event_id ASC) AS nxt
       |  FROM events
       |), trans AS (
       |  SELECT cur, nxt, COUNT(*) AS n_ij FROM seq
       |  WHERE nxt IS NOT NULL GROUP BY cur, nxt
       |), totals AS (
       |  SELECT cur, CAST(SUM(n_ij) AS BIGINT) AS n_i FROM trans GROUP BY cur
       |), matrix AS (
       |  SELECT t.cur, t.nxt, t.n_ij, o.n_i
       |  FROM trans t JOIN totals o ON t.cur = o.cur
       |), pi0 AS (
       |  SELECT cur AS state, CAST(${MassScale / 5L} AS BIGINT) AS mass
       |  FROM totals
       |),
       |$rounds
       |SELECT state, ROUND(CAST(mass AS DOUBLE) / $MassScale, 4) AS pi
       |FROM pi$StationaryRounds
       |ORDER BY state ASC NULLS FIRST""".stripMargin
  }

  /** The EWMA kernel rendered as exact decimal literals for the
    * oracle (every 2^-k has a finite decimal form, so both engines
    * parse the identical double). */
  private def ewmaSqlExpr: String =
    (0 until EwmaTaps).map { k =>
      val w = java.math.BigDecimal.valueOf(ewmaWeight(k)).toPlainString
      s"x$k * $w"
    }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    // The c184 oracle replays the integer cut/embargo arithmetic and
    // the three-way classification verbatim.
    "c184_temporal_split_embargo" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
         |b AS (SELECT MIN(ts_us) AS lo, MAX(ts_us) AS hi FROM e),
         |s AS (
         |  SELECT user_id, ts_us,
         |    CASE WHEN ts_us >= lo + ((hi - lo) * 4) // 5 THEN 'test'
         |         WHEN ts_us >= lo + ((hi - lo) * 4) // 5 - (hi - lo) // $EmbargoDen
         |           THEN 'embargo_dropped'
         |         ELSE 'train' END AS split
         |  FROM e CROSS JOIN b
         |)
         |SELECT split, COUNT(*) AS n_events,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         |  MIN(ts_us) AS min_ts_us, MAX(ts_us) AS max_ts_us
         |FROM s GROUP BY split
         |ORDER BY split ASC NULLS FIRST""".stripMargin,

    // The c183 oracle replays integer-cents binning and the SHARED
    // WOE/IV formula texts verbatim — a moved bin boundary or a
    // drifted smoothing constant fails the hash.
    "c183_woe_binning" ->
      s"""WITH o AS (
         |  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         |    o_orderpriority = '1-URGENT' AS pos
         |  FROM orders
         |), b AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM o),
         |agg AS (
         |  SELECT (cents - lo) // ((hi - lo) // $WoeBins + 1) AS bin,
         |    COUNT(*) AS n,
         |    CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS n_pos,
         |    CAST(COUNT(*) FILTER (WHERE NOT pos) AS BIGINT) AS n_neg
         |  FROM o CROSS JOIN b GROUP BY 1
         |), tot AS (
         |  SELECT CAST(SUM(n_pos) AS BIGINT) AS pos_tot,
         |    CAST(SUM(n_neg) AS BIGINT) AS neg_tot FROM agg
         |)
         |SELECT bin, n, n_pos, n_neg,
         |  ROUND($woeSql, 4) AS woe,
         |  ROUND($ivSql, 4) AS iv
         |FROM agg CROSS JOIN tot
         |ORDER BY bin ASC NULLS FIRST""".stripMargin,

    "b77_interval_coalesce" ->
      s"""WITH iv AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS s,
         |    epoch_us(ts) + $IntervalUs AS e
         |  FROM events
         |), marked AS (
         |  SELECT user_id, s, e, event_id,
         |    CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END
         |      AS new_island
         |  FROM (
         |    SELECT user_id, s, e,
         |      max(e) OVER (PARTITION BY user_id
         |        ORDER BY s ASC NULLS FIRST, event_id ASC NULLS FIRST
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |        AS prev_max_e,
         |      event_id
         |    FROM iv
         |  )
         |), numbered AS (
         |  SELECT user_id, s, e,
         |    sum(new_island) OVER (PARTITION BY user_id
         |      ORDER BY s ASC NULLS FIRST, event_id ASC NULLS FIRST
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |  FROM marked
         |), islands AS (
         |  SELECT user_id, island, min(s) AS istart, max(e) AS iend
         |  FROM numbered GROUP BY user_id, island
         |)
         |SELECT user_id, COUNT(*) AS n_islands,
         |  CAST(SUM(iend - istart) AS BIGINT) AS covered_us,
         |  max(iend - istart) AS longest_us
         |FROM islands GROUP BY user_id
         |ORDER BY user_id ASC NULLS FIRST""".stripMargin,

    "b78_resample_ffill" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
         |    epoch_us(ts) // $DayUs AS day
         |  FROM events
         |), closes AS (
         |  SELECT user_id, day, value AS close FROM (
         |    SELECT user_id, day, value, row_number() OVER (
         |      PARTITION BY user_id, day
         |      ORDER BY ts_us DESC, event_id DESC) AS rn
         |    FROM e
         |  ) WHERE rn = 1
         |), bounds AS (
         |  SELECT user_id, min(day) AS dmin, max(day) AS dmax
         |  FROM closes GROUP BY user_id
         |), spine AS (
         |  SELECT user_id, unnest(generate_series(dmin, dmax)) AS day
         |  FROM bounds
         |)
         |SELECT s.user_id, s.day,
         |  last_value(c.close IGNORE NULLS) OVER (
         |    PARTITION BY s.user_id ORDER BY s.day ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
         |  CASE WHEN c.close IS NOT NULL THEN 1 ELSE 0 END AS observed
         |FROM spine s LEFT JOIN closes c
         |  ON s.user_id = c.user_id AND s.day = c.day
         |ORDER BY s.user_id ASC NULLS FIRST, s.day ASC NULLS FIRST""".stripMargin,

    "c121_kmv_pair_overlap" ->
      s"""WITH grams AS (
         |  SELECT DISTINCT source, g FROM (
         |    SELECT source, unnest(list_transform(
         |      generate_series(1, len(ws) - 2),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
         |    FROM (SELECT source, string_split(text, ' ') AS ws FROM documents)
         |    WHERE len(ws) >= 3
         |  )
         |), n_exact AS (
         |  SELECT source, COUNT(*) AS n FROM grams GROUP BY source
         |), pairs_exact AS (
         |  SELECT x.source AS source_a, y.source AS source_b,
         |    COUNT(*) AS inter_exact
         |  FROM grams x JOIN grams y ON x.g = y.g AND x.source < y.source
         |  GROUP BY 1, 2
         |), hashed AS (
         |  SELECT DISTINCT source,
         |    (CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) + 0.5)
         |      / 4294967296.0 AS u
         |  FROM grams
         |), sk AS (
         |  SELECT source, u FROM (
         |    SELECT source, u, row_number() OVER (PARTITION BY source
         |      ORDER BY u ASC NULLS FIRST) AS rn
         |    FROM hashed
         |  ) WHERE rn <= $PairK
         |), prs AS (
         |  SELECT a.source AS sa, b.source AS sb
         |  FROM n_exact a JOIN n_exact b ON a.source < b.source
         |), merged AS (
         |  SELECT sa, sb, u, in_a, in_b FROM (
         |    SELECT sa, sb, u, max(in_a) AS in_a, max(in_b) AS in_b,
         |      row_number() OVER (PARTITION BY sa, sb
         |        ORDER BY u ASC NULLS FIRST) AS rn
         |    FROM (
         |      SELECT p.sa, p.sb, k.u, 1 AS in_a, 0 AS in_b
         |      FROM prs p JOIN sk k ON p.sa = k.source
         |      UNION ALL
         |      SELECT p.sa, p.sb, k.u, 0 AS in_a, 1 AS in_b
         |      FROM prs p JOIN sk k ON p.sb = k.source
         |    ) GROUP BY sa, sb, u
         |  ) WHERE rn <= $PairK
         |), est AS (
         |  SELECT sa, sb, CAST(SUM(in_a * in_b) AS BIGINT) AS matches,
         |    max(CASE WHEN rn = $PairK THEN u END) AS uk
         |  FROM (
         |    SELECT sa, sb, u, in_a, in_b, row_number() OVER (
         |      PARTITION BY sa, sb ORDER BY u ASC NULLS FIRST) AS rn
         |    FROM merged
         |  ) GROUP BY sa, sb
         |)
         |SELECT source_a, source_b, na.n AS n_a, nb.n AS n_b, inter_exact,
         |  ROUND(CAST(inter_exact AS DOUBLE)
         |    / (na.n + nb.n - inter_exact), 4) AS j_exact,
         |  ROUND(CAST(matches AS DOUBLE) / $PairK, 4) AS j_kmv,
         |  ROUND(${PairK - 1} / uk, 2) AS d_union_est,
         |  ROUND(CAST(matches AS DOUBLE) / $PairK * (${PairK - 1} / uk), 2)
         |    AS inter_est
         |FROM pairs_exact
         |  JOIN n_exact na ON source_a = na.source
         |  JOIN n_exact nb ON source_b = nb.source
         |  JOIN est ON source_a = sa AND source_b = sb
         |ORDER BY source_a ASC NULLS FIRST, source_b ASC NULLS FIRST""".stripMargin,

    "c122_chi2_proportions" ->
      s"""WITH firsts AS (
         |  SELECT user_id, event_type, value > $ConvCut AS conv,
         |    substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 1) < '8' AS a
         |  FROM (
         |    SELECT user_id, event_type, value, row_number() OVER (
         |      PARTITION BY user_id, event_type
         |      ORDER BY epoch_us(ts) ASC, event_id ASC) AS rn
         |    FROM events
         |  ) WHERE rn = 1
         |), t AS (
         |  SELECT event_type,
         |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN a AND conv THEN 1 ELSE 0 END) AS BIGINT)
         |      AS conv_a,
         |    CAST(SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(SUM(CASE WHEN NOT a AND conv THEN 1 ELSE 0 END) AS BIGINT)
         |      AS conv_b
         |  FROM firsts GROUP BY event_type
         |)
         |SELECT event_type, n_a, conv_a, n_b, conv_b,
         |  ROUND(aa / n_a, 4) AS rate_a,
         |  ROUND(cc / n_b, 4) AS rate_b,
         |  CASE WHEN (aa + bb) * (cc + dd) * (aa + cc) * (bb + dd) > 0.0
         |  THEN ROUND(
         |    (aa + bb + cc + dd) * (aa * dd - bb * cc) * (aa * dd - bb * cc)
         |    / ((aa + bb) * (cc + dd) * (aa + cc) * (bb + dd)), 4)
         |  END AS chi2
         |FROM (
         |  SELECT event_type, n_a, conv_a, n_b, conv_b,
         |    CAST(conv_a AS DOUBLE) AS aa,
         |    CAST(n_a - conv_a AS DOUBLE) AS bb,
         |    CAST(conv_b AS DOUBLE) AS cc,
         |    CAST(n_b - conv_b AS DOUBLE) AS dd
         |  FROM t
         |)
         |ORDER BY event_type ASC NULLS FIRST""".stripMargin,

    "c123_mann_whitney_u" ->
      """WITH metric AS (
        |  SELECT user_id, event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS m,
        |    substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 1) < '8' AS a
        |  FROM events GROUP BY user_id, event_type
        |), ranked AS (
        |  SELECT event_type, m, a,
        |    CAST(rank() OVER (PARTITION BY event_type
        |      ORDER BY m ASC NULLS FIRST) AS BIGINT) AS rk,
        |    count(*) OVER (PARTITION BY event_type, m) AS tcnt
        |  FROM metric
        |), rk2 AS (
        |  SELECT event_type, a,
        |    CAST(rk AS DOUBLE) + CAST(tcnt - 1 AS DOUBLE) / 2.0 AS avg_rk
        |  FROM ranked
        |), ties AS (
        |  SELECT event_type, CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
        |  FROM (SELECT event_type, m, COUNT(*) AS t
        |        FROM metric GROUP BY event_type, m)
        |  GROUP BY event_type
        |), agg AS (
        |  SELECT r.event_type,
        |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    SUM(CASE WHEN a THEN avg_rk ELSE 0.0 END) AS r1
        |  FROM rk2 r GROUP BY r.event_type
        |)
        |SELECT a.event_type, n1, n2,
        |  ROUND(r1 - CAST(n1 AS DOUBLE) * CAST(n1 + 1 AS DOUBLE) / 2.0, 1)
        |    AS u_stat,
        |  CASE WHEN
        |    CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |      ((CAST(n1 + n2 AS DOUBLE) + 1.0) - CAST(tie_term AS DOUBLE)
        |        / (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1.0)))
        |    > 0.0
        |  THEN ROUND(
        |    (r1 - CAST(n1 AS DOUBLE) * CAST(n1 + 1 AS DOUBLE) / 2.0
        |      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
        |    / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |      ((CAST(n1 + n2 AS DOUBLE) + 1.0) - CAST(tie_term AS DOUBLE)
        |        / (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1.0))))
        |    , 4)
        |  END AS z
        |FROM agg a JOIN ties t ON a.event_type = t.event_type
        |ORDER BY a.event_type ASC NULLS FIRST""".stripMargin,

    "c124_benford_audit" ->
      """WITH digits AS (
        |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INTEGER) AS digit,
        |    COUNT(*) AS n_obs
        |  FROM orders GROUP BY 1
        |), total AS (SELECT COUNT(*) AS n FROM orders),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(1, 9)) AS INTEGER) AS digit
        |)
        |SELECT s.digit, COALESCE(n_obs, 0) AS n_obs,
        |  ROUND(CAST(COALESCE(n_obs, 0) AS DOUBLE) / n, 4) AS p_obs,
        |  ROUND(log10(1.0 + 1.0 / CAST(s.digit AS DOUBLE)), 4) AS p_benford,
        |  ROUND((CAST(COALESCE(n_obs, 0) AS DOUBLE)
        |      - n * log10(1.0 + 1.0 / CAST(s.digit AS DOUBLE)))
        |    * (CAST(COALESCE(n_obs, 0) AS DOUBLE)
        |      - n * log10(1.0 + 1.0 / CAST(s.digit AS DOUBLE)))
        |    / (n * log10(1.0 + 1.0 / CAST(s.digit AS DOUBLE))), 4)
        |    AS chi2_contrib
        |FROM spine s LEFT JOIN digits d ON s.digit = d.digit, total
        |ORDER BY s.digit ASC NULLS FIRST""".stripMargin,

    "c125_basket_lift" ->
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |), nb AS (
         |  SELECT COUNT(DISTINCT ok) AS n_baskets FROM items
         |), bn AS (
         |  SELECT brand, COUNT(*) AS cnt FROM items GROUP BY brand
         |), pr AS (
         |  SELECT x.brand AS brand_a, y.brand AS brand_b, COUNT(*) AS n_ab
         |  FROM items x JOIN items y ON x.ok = y.ok AND x.brand < y.brand
         |  GROUP BY 1, 2
         |  HAVING COUNT(*) >= $BasketMinPairN
         |)
         |SELECT brand_a, brand_b, n_ab, a.cnt AS n_a, b.cnt AS n_b,
         |  ROUND(CAST(n_ab AS DOUBLE) / n_baskets, 4) AS support,
         |  ROUND(CAST(n_ab AS DOUBLE) / a.cnt, 4) AS conf_a_to_b,
         |  ROUND(CAST(n_ab AS DOUBLE) * n_baskets
         |    / (CAST(a.cnt AS DOUBLE) * b.cnt), 4) AS lift
         |FROM pr JOIN bn a ON brand_a = a.brand
         |  JOIN bn b ON brand_b = b.brand, nb
         |ORDER BY brand_a ASC NULLS FIRST, brand_b ASC NULLS FIRST""".stripMargin,

    "c126_window_funnel" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS ts FROM events
         |), v AS (SELECT user_id, ts AS vts FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id, ts AS cts FROM e WHERE event_type = 'click'),
         |p AS (SELECT user_id, ts AS pts FROM e WHERE event_type = 'purchase'),
         |vc AS (
         |  SELECT v.user_id, vts, min(cts) AS c1
         |  FROM v JOIN c ON v.user_id = c.user_id
         |    AND cts > vts AND cts <= vts + $FunnelWUs
         |  GROUP BY v.user_id, vts
         |), vcp AS (
         |  SELECT vc.user_id, vts, min(pts) AS p1
         |  FROM vc JOIN p ON vc.user_id = p.user_id
         |    AND pts > c1 AND pts <= vts + $FunnelWUs
         |  GROUP BY vc.user_id, vts
         |)
         |SELECT v.user_id, COUNT(*) AS n_anchors,
         |  max(1 + CASE WHEN c1 IS NOT NULL THEN 1 ELSE 0 END
         |        + CASE WHEN p1 IS NOT NULL THEN 1 ELSE 0 END) AS best_depth
         |FROM v
         |  LEFT JOIN vc ON v.user_id = vc.user_id AND v.vts = vc.vts
         |  LEFT JOIN vcp ON v.user_id = vcp.user_id AND v.vts = vcp.vts
         |GROUP BY v.user_id
         |ORDER BY v.user_id ASC NULLS FIRST""".stripMargin,

    "c127_largest_remainder_alloc" ->
      s"""WITH rev AS (
         |  SELECT n_name,
         |    SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_c
         |  FROM orders
         |    JOIN customer ON o_custkey = c_custkey
         |    JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY n_name
         |), shares AS (
         |  SELECT n_name, rev_c,
         |    SUM(rev_c) OVER () AS t_c,
         |    ($AllocUnits * rev_c) // (SUM(rev_c) OVER ()) AS base,
         |    $AllocUnits * rev_c
         |      - (($AllocUnits * rev_c) // (SUM(rev_c) OVER ()))
         |        * (SUM(rev_c) OVER ()) AS rem
         |  FROM rev
         |), ranked AS (
         |  SELECT n_name, rev_c, base,
         |    $AllocUnits - SUM(base) OVER () AS leftover,
         |    row_number() OVER (ORDER BY rem DESC, n_name ASC) AS rrank
         |  FROM shares
         |)
         |SELECT n_name, CAST(rev_c AS BIGINT) AS rev_cents,
         |  CAST(base AS BIGINT) AS base,
         |  CAST(base + CASE WHEN rrank <= leftover THEN 1 ELSE 0 END AS BIGINT)
         |    AS alloc
         |FROM ranked
         |ORDER BY n_name ASC NULLS FIRST""".stripMargin,

    "c128_pareto_frontier" ->
      """WITH pts AS (
        |  SELECT p_retailprice AS price, p_size AS size, COUNT(*) AS n_parts
        |  FROM part GROUP BY 1, 2
        |), marked AS (
        |  SELECT price, size, n_parts,
        |    max(size) OVER (ORDER BY price ASC, size DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
        |  FROM pts
        |)
        |SELECT price, size, n_parts FROM marked
        |WHERE runmax IS NULL OR size > runmax
        |ORDER BY price ASC NULLS FIRST""".stripMargin,

    "b79_moving_median" ->
      s"""WITH framed AS (
         |  SELECT o_custkey, o_orderkey, o_totalprice,
         |    list_sort(list(o_totalprice) OVER (PARTITION BY o_custkey
         |      ORDER BY o_orderdate ASC, o_orderkey ASC
         |      ROWS BETWEEN ${MedianFrame - 1} PRECEDING AND CURRENT ROW))
         |      AS frame
         |  FROM orders
         |)
         |SELECT o_custkey, o_orderkey, o_totalprice,
         |  CASE WHEN len(frame) % 2 = 1
         |    THEN frame[CAST((len(frame) + 1) // 2 AS INTEGER)]
         |    ELSE (frame[CAST(len(frame) // 2 AS INTEGER)]
         |      + frame[CAST(len(frame) // 2 + 1 AS INTEGER)]) / 2.0
         |  END AS med5
         |FROM framed
         |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,

    "b80_mode_priority" ->
      """SELECT c_mktsegment, o_orderpriority AS mode_priority, n FROM (
        |  SELECT c_mktsegment, o_orderpriority, n, row_number() OVER (
        |    PARTITION BY c_mktsegment
        |    ORDER BY n DESC, o_orderpriority ASC) AS rn
        |  FROM (
        |    SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
        |    FROM orders JOIN customer ON o_custkey = c_custkey
        |    GROUP BY 1, 2
        |  )
        |) WHERE rn = 1
        |ORDER BY c_mktsegment ASC NULLS FIRST""".stripMargin,

    "c130_ewma_dyadic" -> {
      val lags = (0 until EwmaTaps).map(k =>
        s"lag(value, $k) OVER (PARTITION BY user_id " +
          "ORDER BY epoch_us(ts) ASC, event_id ASC) AS x" + k).mkString(",\n|    ")
      s"""WITH lagged AS (
         |  SELECT user_id, event_id, value,
         |    $lags
         |  FROM events
         |)
         |SELECT user_id, event_id, value,
         |  $ewmaSqlExpr AS ewma16
         |FROM lagged
         |WHERE x${EwmaTaps - 1} IS NOT NULL
         |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin
    },

    "c131_session_paths" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER w AS t1,
        |    lead(event_type, 2) OVER w AS t2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY epoch_us(ts) ASC, event_id ASC)
        |), paths AS (
        |  SELECT event_type || '>' || t1 || '>' || t2 AS path, COUNT(*) AS n
        |  FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
        |  GROUP BY 1
        |), total AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM paths)
        |SELECT path, n, ROUND(CAST(n AS DOUBLE) / n_total, 4) AS share
        |FROM paths, total
        |ORDER BY path ASC NULLS FIRST""".stripMargin,

    "c132_sharded_topk_bounds" ->
      s"""WITH toks AS (
         |  SELECT CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
         |      1, 2)) AS BIGINT) % $TopkShards AS shard,
         |    unnest(string_split(text, ' ')) AS w
         |  FROM documents
         |), counts AS (
         |  SELECT shard, w, COUNT(*) AS cnt FROM toks GROUP BY shard, w
         |), published AS (
         |  SELECT shard, w, cnt FROM (
         |    SELECT shard, w, cnt, row_number() OVER (PARTITION BY shard
         |      ORDER BY cnt DESC, w ASC) AS rn
         |    FROM counts
         |  ) WHERE rn <= $TopkM
         |), thresholds AS (
         |  SELECT shard, min(cnt) AS t_s FROM published GROUP BY shard
         |), b_all AS (
         |  SELECT CAST(SUM(t_s) AS BIGINT) AS b_ceiling FROM thresholds
         |), candidates AS (SELECT DISTINCT w FROM published),
         |grid AS (
         |  SELECT c.w, t.shard, t.t_s, p.cnt
         |  FROM candidates c CROSS JOIN thresholds t
         |  LEFT JOIN published p ON p.shard = t.shard AND p.w = c.w
         |), bounds AS (
         |  SELECT w, CAST(SUM(COALESCE(cnt, 0)) AS BIGINT) AS lb,
         |    CAST(SUM(COALESCE(cnt, t_s)) AS BIGINT) AS ub
         |  FROM grid GROUP BY w
         |), exact AS (
         |  SELECT w, COUNT(*) AS n_exact FROM toks GROUP BY w
         |)
         |SELECT w AS token, lb, ub, n_exact,
         |  CASE WHEN lb >= b_ceiling THEN 1 ELSE 0 END AS certified
         |FROM (
         |  SELECT b.w, lb, ub, n_exact, b_ceiling, row_number() OVER (
         |    ORDER BY lb DESC, b.w ASC) AS rk
         |  FROM bounds b JOIN exact e ON b.w = e.w, b_all
         |) WHERE rk <= 10
         |ORDER BY lb DESC, token ASC""".stripMargin,

    "c133_expectation_audit" ->
      s"""WITH m AS (
         |  SELECT COUNT(*) AS n,
         |    COUNT(o_custkey) AS n_custkey,
         |    COUNT(DISTINCT o_orderkey) AS n_distinct_key,
         |    CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0
         |      END) AS BIGINT) AS n_status_ok,
         |    CAST(SUM(CASE WHEN o_totalprice > 0.0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_price_pos,
         |    CAST(SUM(CASE WHEN epoch_us(o_orderdate) >= $OrderDateMinUs
         |      AND epoch_us(o_orderdate) < $OrderDateMaxUs THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_date_ok
         |  FROM orders
         |), orph AS (
         |  SELECT COUNT(*) AS n_orphans FROM orders
         |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
         |), r AS (
         |  SELECT ROUND(CAST(n_custkey AS DOUBLE) / n, 4) AS r_custkey,
         |    ROUND(CAST(n_distinct_key AS DOUBLE) / n, 4) AS r_unique,
         |    ROUND(CAST(n_status_ok AS DOUBLE) / n, 4) AS r_status,
         |    ROUND(CAST(n_price_pos AS DOUBLE) / n, 4) AS r_price,
         |    ROUND(CAST(n_date_ok AS DOUBLE) / n, 4) AS r_date,
         |    ROUND(CAST(n_orphans AS DOUBLE) / n, 4) AS r_orphan
         |  FROM m, orph
         |)
         |SELECT check_name, metric, pass FROM (
         |  SELECT 'completeness_custkey' AS check_name, r_custkey AS metric,
         |    CAST(r_custkey >= 1.0 AS INT) AS pass FROM r
         |  UNION ALL SELECT 'uniqueness_orderkey', r_unique,
         |    CAST(r_unique >= 1.0 AS INT) FROM r
         |  UNION ALL SELECT 'status_in_set', r_status,
         |    CAST(r_status >= 1.0 AS INT) FROM r
         |  UNION ALL SELECT 'price_positive', r_price,
         |    CAST(r_price >= 1.0 AS INT) FROM r
         |  UNION ALL SELECT 'date_in_range', r_date,
         |    CAST(r_date >= 1.0 AS INT) FROM r
         |  UNION ALL SELECT 'no_orphan_custkeys', r_orphan,
         |    CAST(r_orphan <= 0.0 AS INT) FROM r
         |)
         |ORDER BY check_name ASC NULLS FIRST""".stripMargin,

    "c134_linear_attribution" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts
         |  FROM events
         |), conv AS (
         |  SELECT user_id, event_id AS conv_id, ts AS pts
         |  FROM e WHERE event_type = 'purchase'
         |), touches AS (
         |  SELECT user_id, event_type AS channel, ts AS tts
         |  FROM e WHERE event_type IN ('view', 'click')
         |), joined AS (
         |  SELECT conv_id, channel
         |  FROM conv c JOIN touches t ON c.user_id = t.user_id
         |    AND t.tts <= c.pts AND t.tts > c.pts - $FunnelWUs
         |), credited AS (
         |  SELECT channel, COUNT(*) AS n_touches,
         |    COUNT(DISTINCT conv_id) AS n_convs,
         |    ROUND(CAST(SUM(credit) AS DOUBLE) / $MassScale, 4)
         |      AS credit_total
         |  FROM (
         |    SELECT conv_id, channel,
         |      CAST($MassScale AS BIGINT)
         |        // (count(*) OVER (PARTITION BY conv_id)) AS credit
         |    FROM joined
         |  ) GROUP BY channel
         |), unattributed AS (
         |  SELECT '(none)' AS channel, CAST(0 AS BIGINT) AS n_touches,
         |    COUNT(*) AS n_convs, 0.0 AS credit_total
         |  FROM conv WHERE conv_id NOT IN (SELECT conv_id FROM joined)
         |)
         |SELECT channel, n_touches, n_convs, credit_total FROM credited
         |UNION ALL
         |SELECT channel, n_touches, n_convs, credit_total FROM unattributed
         |ORDER BY channel ASC NULLS FIRST""".stripMargin,

    "c135_seasonal_baseline" ->
      s"""WITH b AS (
         |  SELECT value, epoch_us(ts) // $DayUs AS day,
         |    (epoch_us(ts) // 3600000000) % 24 AS hod
         |  FROM events
         |), dh AS (
         |  SELECT day, hod, SUM(CAST(value AS DECIMAL(38,6))) AS s
         |  FROM b GROUP BY day, hod
         |), dh2 AS (
         |  SELECT day, hod, s, s * s AS s2 FROM dh
         |), prof AS (
         |  SELECT hod, COUNT(*) AS n_days,
         |    CAST(SUM(s) AS DOUBLE) AS s1, CAST(SUM(s2) AS DOUBLE) AS sq
         |  FROM dh2 GROUP BY hod
         |), prof2 AS (
         |  SELECT hod, n_days, s1 / n_days AS mean_h,
         |    CASE WHEN n_days > 1
         |      THEN sqrt((sq - s1 * s1 / n_days) / (n_days - 1)) END AS sd_h
         |  FROM prof
         |)
         |SELECT d.hod, p.n_days, ROUND(p.mean_h, 4) AS baseline,
         |  ROUND(p.sd_h, 4) AS sd,
         |  CAST(SUM(CASE WHEN abs(CAST(d.s AS DOUBLE) - p.mean_h)
         |    > 2.0 * p.sd_h THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_anomalous_days
         |FROM dh2 d JOIN prof2 p ON d.hod = p.hod
         |GROUP BY d.hod, p.n_days, p.mean_h, p.sd_h
         |ORDER BY d.hod ASC NULLS FIRST""".stripMargin,

    "b81_abc_classification" ->
      """WITH rev AS (
        |  SELECT p_brand,
        |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)))
        |      AS rev_d
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand
        |), cum AS (
        |  SELECT p_brand, rev_d,
        |    SUM(rev_d) OVER (ORDER BY rev_d DESC, p_brand ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_d,
        |    SUM(rev_d) OVER () AS tot_d
        |  FROM rev
        |), shares AS (
        |  SELECT p_brand, CAST(rev_d AS DOUBLE) AS revenue,
        |    CAST(cum_d AS DOUBLE) / CAST(tot_d AS DOUBLE) AS cum_share
        |  FROM cum
        |)
        |SELECT p_brand, revenue, ROUND(cum_share, 4) AS cum_share,
        |  CASE WHEN cum_share <= 0.8 THEN 'A'
        |       WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc_class
        |FROM shares
        |ORDER BY revenue DESC, p_brand ASC""".stripMargin,

    "b82_window_distinct" ->
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(len(list_distinct(list(o_orderpriority) OVER (
         |    PARTITION BY o_custkey
         |    ORDER BY o_orderdate ASC, o_orderkey ASC
         |    ROWS BETWEEN ${DistinctFrame - 1} PRECEDING AND CURRENT ROW)))
         |    AS INTEGER) AS n_distinct_prio
         |FROM orders
         |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,

    "c137_funnel_latency" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS ts FROM events
         |), v AS (SELECT user_id, ts AS vts FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id, ts AS cts FROM e WHERE event_type = 'click'),
         |p AS (SELECT user_id, ts AS pts FROM e WHERE event_type = 'purchase'),
         |vc AS (
         |  SELECT v.user_id, vts, min(cts) AS c1
         |  FROM v JOIN c ON v.user_id = c.user_id
         |    AND cts > vts AND cts <= vts + $FunnelWUs
         |  GROUP BY v.user_id, vts
         |), vcp AS (
         |  SELECT vc.user_id, vts, min(pts) AS p1
         |  FROM vc JOIN p ON vc.user_id = p.user_id
         |    AND pts > c1 AND pts <= vts + $FunnelWUs
         |  GROUP BY vc.user_id, vts
         |), lat AS (
         |  SELECT p1 - vts AS lat_us, user_id, vts FROM vcp
         |), agg AS (
         |  SELECT COUNT(*) AS n,
         |    CAST(SUM(CAST(lat_us AS DECIMAL(38,6))) AS DOUBLE) AS s
         |  FROM lat
         |), ranked AS (
         |  SELECT lat_us, row_number() OVER (
         |    ORDER BY lat_us ASC, user_id ASC, vts ASC) AS rk
         |  FROM lat
         |)
         |SELECT n AS n_conversions,
         |  min(CASE WHEN rk = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1
         |    THEN lat_us END) AS p50_us,
         |  min(CASE WHEN rk = CAST(floor((n - 1) * 0.9) AS BIGINT) + 1
         |    THEN lat_us END) AS p90_us,
         |  ROUND(s / n / 1000000.0, 4) AS mean_s
         |FROM ranked, agg
         |WHERE rk = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1
         |   OR rk = CAST(floor((n - 1) * 0.9) AS BIGINT) + 1
         |GROUP BY n, s
         |ORDER BY n_conversions""".stripMargin,

    "c138_markov_stationary" -> stationarySql,

    "b83_join_asof_forward" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events
        |), clicks AS (
        |  SELECT event_id AS click_id, user_id, ts_us AS click_ts_us
        |  FROM e WHERE event_type = 'click'
        |), purchases AS (
        |  SELECT event_id AS purchase_id, user_id AS puser,
        |    ts_us AS purchase_ts_us
        |  FROM e WHERE event_type = 'purchase'
        |)
        |SELECT click_id, user_id, click_ts_us, purchase_id, purchase_ts_us
        |FROM (
        |  SELECT c.click_id, c.user_id, c.click_ts_us, p.purchase_id,
        |    p.purchase_ts_us,
        |    row_number() OVER (PARTITION BY c.click_id
        |      ORDER BY p.purchase_ts_us ASC NULLS LAST,
        |        p.purchase_id ASC NULLS LAST) AS rn
        |  FROM clicks c LEFT JOIN purchases p
        |    ON c.user_id = p.puser AND p.purchase_ts_us >= c.click_ts_us
        |) WHERE rn = 1
        |ORDER BY click_id ASC NULLS FIRST""".stripMargin,

    "c139_tumbling_ohlc" ->
      s"""WITH e AS (
         |  SELECT value, event_id, epoch_us(ts) AS ts_us,
         |    epoch_us(ts) // 3600000000 AS hour
         |  FROM events
         |), marked AS (
         |  SELECT hour, value,
         |    row_number() OVER (PARTITION BY hour
         |      ORDER BY ts_us ASC, event_id ASC) AS rn_a,
         |    row_number() OVER (PARTITION BY hour
         |      ORDER BY ts_us DESC, event_id DESC) AS rn_d
         |  FROM e
         |)
         |SELECT hour,
         |  min(CASE WHEN rn_a = 1 THEN value END) AS open,
         |  max(value) AS high, min(value) AS low,
         |  min(CASE WHEN rn_d = 1 THEN value END) AS close,
         |  COUNT(*) AS n_events,
         |  ${graft.Canon.oDsum("value")} AS volume
         |FROM marked GROUP BY hour
         |ORDER BY hour ASC NULLS FIRST""".stripMargin,

    "c140_period_movers" ->
      s"""WITH e AS (
         |  SELECT event_type, value, epoch_us(ts) // $DayUs AS day
         |  FROM events
         |), bounds AS (
         |  SELECT min(day) + (max(day) - min(day) + 1) // 2 AS mid FROM e
         |), halves AS (
         |  SELECT event_type,
         |    CAST(SUM(CASE WHEN day < mid
         |      THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS v1,
         |    CAST(SUM(CASE WHEN day >= mid
         |      THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS v2,
         |    CAST(SUM(CASE WHEN day < mid THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS BIGINT) AS n2
         |  FROM e, bounds GROUP BY event_type
         |)
         |SELECT event_type, n1, n2, ROUND(v1, 4) AS v1, ROUND(v2, 4) AS v2,
         |  ROUND(v2 - v1, 4) AS delta,
         |  CASE WHEN v1 > 0.0 THEN ROUND((v2 - v1) / v1, 4) END AS pct_change
         |FROM halves
         |ORDER BY event_type ASC NULLS FIRST""".stripMargin,

    "c141_new_vs_returning" ->
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events
         |), fd AS (
         |  SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id
         |)
         |SELECT day, COUNT(*) AS n_active,
         |  CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_new,
         |  COUNT(*) - CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_returning
         |FROM ud JOIN fd USING (user_id)
         |GROUP BY day
         |ORDER BY day ASC NULLS FIRST""".stripMargin,

    "c142_power_analysis" ->
      s"""WITH firsts AS (
         |  SELECT user_id, event_type, value > $ConvCut AS conv,
         |    substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 1) < '8' AS a
         |  FROM (
         |    SELECT user_id, event_type, value, row_number() OVER (
         |      PARTITION BY user_id, event_type
         |      ORDER BY epoch_us(ts) ASC, event_id ASC) AS rn
         |    FROM events
         |  ) WHERE rn = 1
         |), t AS (
         |  SELECT event_type,
         |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN a AND conv THEN 1 ELSE 0 END) AS BIGINT)
         |      AS conv_a,
         |    CAST(SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(SUM(CASE WHEN NOT a AND conv THEN 1 ELSE 0 END) AS BIGINT)
         |      AS conv_b
         |  FROM firsts GROUP BY event_type
         |), rates AS (
         |  SELECT event_type, n_a, n_b,
         |    CAST(conv_a AS DOUBLE) / n_a AS p1,
         |    CAST(conv_b AS DOUBLE) / n_b AS p2,
         |    CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS pbar
         |  FROM t
         |), calc AS (
         |  SELECT event_type, n_a, n_b, p1, p2,
         |    ($ZAlpha * sqrt(2.0 * pbar * (1.0 - pbar))
         |      + $ZBeta * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))) AS nr,
         |    p1 - p2 AS delta
         |  FROM rates
         |)
         |SELECT event_type, n_a, n_b,
         |  ROUND(p1, 4) AS rate_a, ROUND(p2, 4) AS rate_b,
         |  CASE WHEN delta <> 0.0
         |    THEN CAST(ceil(nr * nr / (delta * delta)) AS BIGINT)
         |  END AS n_required,
         |  CASE WHEN delta <> 0.0 THEN
         |    CASE WHEN CAST(least(n_a, n_b) AS DOUBLE)
         |      >= ceil(nr * nr / (delta * delta)) THEN 1 ELSE 0 END
         |  END AS powered
         |FROM calc
         |ORDER BY event_type ASC NULLS FIRST""".stripMargin,

    "c144_cohort_ltv" ->
      s"""WITH e AS (
         |  SELECT user_id, value, epoch_us(ts) // $DayUs AS day FROM events
         |), fd AS (
         |  SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id
         |), sizes AS (
         |  SELECT cohort, COUNT(*) AS n_users FROM fd GROUP BY cohort
         |), curve AS (
         |  SELECT cohort, day - cohort AS age,
         |    SUM(CAST(value AS DECIMAL(38,6))) AS pv_d
         |  FROM e JOIN fd USING (user_id)
         |  GROUP BY cohort, day - cohort
         |), cum AS (
         |  SELECT cohort, age, pv_d,
         |    SUM(pv_d) OVER (PARTITION BY cohort ORDER BY age ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_d
         |  FROM curve
         |)
         |SELECT c.cohort, age, n_users,
         |  ROUND(CAST(pv_d AS DOUBLE), 6) AS period_value,
         |  ROUND(CAST(cum_d AS DOUBLE), 6) AS cum_value
         |FROM cum c JOIN sizes s ON c.cohort = s.cohort
         |ORDER BY c.cohort ASC NULLS FIRST, age ASC NULLS FIRST""".stripMargin,

    "c145_gap_histogram" ->
      """WITH gaps AS (
        |  SELECT (ts_us - prev) // 1000000 AS gap_s FROM (
        |    SELECT epoch_us(ts) AS ts_us,
        |      lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |        ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev
        |    FROM events
        |  ) WHERE prev IS NOT NULL
        |), pos AS (
        |  SELECT gap_s FROM gaps WHERE gap_s >= 1
        |), bucketed AS (
        |  SELECT CAST(length(bin(gap_s)) - 1 AS INTEGER) AS bucket,
        |    COUNT(*) AS n
        |  FROM pos GROUP BY 1
        |), total AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM bucketed)
        |SELECT bucket, CAST(1 AS BIGINT) << bucket AS gap_from_s,
        |  (CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS gap_to_s,
        |  n, ROUND(CAST(n AS DOUBLE) / n_total, 4) AS share
        |FROM bucketed, total
        |ORDER BY bucket ASC NULLS FIRST""".stripMargin,

    "c146_cuped_adjustment" ->
      s"""WITH e AS (
         |  SELECT user_id, value, epoch_us(ts) // $DayUs AS day FROM events
         |), bounds AS (
         |  SELECT min(day) + (max(day) - min(day) + 1) // 2 AS mid FROM e
         |), pu AS (
         |  SELECT user_id,
         |    COALESCE(SUM(CASE WHEN day < mid
         |      THEN CAST(value AS DECIMAL(38,6)) END),
         |      CAST(0 AS DECIMAL(38,6))) AS x,
         |    COALESCE(SUM(CASE WHEN day >= mid
         |      THEN CAST(value AS DECIMAL(38,6)) END),
         |      CAST(0 AS DECIMAL(38,6))) AS y,
         |    substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 1) < '8' AS a
         |  FROM e, bounds GROUP BY user_id
         |), m AS (
         |  SELECT COUNT(*) AS n,
         |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         |    CAST(SUM(x * x) AS DOUBLE) AS sxx,
         |    CAST(SUM(x * y) AS DOUBLE) AS sxy,
         |    CAST(SUM(y * y) AS DOUBLE) AS syy,
         |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN a THEN x END) AS DOUBLE) AS sx_a,
         |    CAST(SUM(CASE WHEN a THEN y END) AS DOUBLE) AS sy_a,
         |    CAST(SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(SUM(CASE WHEN NOT a THEN x END) AS DOUBLE) AS sx_b,
         |    CAST(SUM(CASE WHEN NOT a THEN y END) AS DOUBLE) AS sy_b
         |  FROM pu
         |)
         |SELECT n, n_a, n_b,
         |  ROUND(CASE WHEN sxx - sx * sx / n > 0
         |    THEN (sxy - sx * sy / n) / (sxx - sx * sx / n) END, 4) AS theta,
         |  ROUND(sy_a / n_a - (CASE WHEN sxx - sx * sx / n > 0
         |    THEN (sxy - sx * sy / n) / (sxx - sx * sx / n) END)
         |    * (sx_a / n_a - sx / n), 4) AS adj_mean_a,
         |  ROUND(sy_b / n_b - (CASE WHEN sxx - sx * sx / n > 0
         |    THEN (sxy - sx * sy / n) / (sxx - sx * sx / n) END)
         |    * (sx_b / n_b - sx / n), 4) AS adj_mean_b,
         |  ROUND(CASE WHEN sxx - sx * sx / n > 0 AND syy - sy * sy / n > 0
         |    THEN (sxy - sx * sy / n) * (sxy - sx * sy / n)
         |      / ((sxx - sx * sx / n) * (syy - sy * sy / n)) END, 4)
         |    AS var_reduction
         |FROM m""".stripMargin,

    "c147_did_estimator" ->
      s"""WITH e AS (
         |  SELECT value, epoch_us(ts) // $DayUs AS day,
         |    substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 1) < '8' AS a
         |  FROM events
         |), bounds AS (
         |  SELECT min(day) + (max(day) - min(day) + 1) // 2 AS mid FROM e
         |), m AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN a AND day < mid
         |      THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS sa_pre,
         |    CAST(SUM(CASE WHEN a AND day < mid THEN 1 ELSE 0 END) AS BIGINT)
         |      AS na_pre,
         |    CAST(SUM(CASE WHEN a AND day >= mid
         |      THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS sa_post,
         |    CAST(SUM(CASE WHEN a AND day >= mid THEN 1 ELSE 0 END) AS BIGINT)
         |      AS na_post,
         |    CAST(SUM(CASE WHEN NOT a AND day < mid
         |      THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS sb_pre,
         |    CAST(SUM(CASE WHEN NOT a AND day < mid THEN 1 ELSE 0 END)
         |      AS BIGINT) AS nb_pre,
         |    CAST(SUM(CASE WHEN NOT a AND day >= mid
         |      THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS sb_post,
         |    CAST(SUM(CASE WHEN NOT a AND day >= mid THEN 1 ELSE 0 END)
         |      AS BIGINT) AS nb_post
         |  FROM e, bounds
         |)
         |SELECT
         |  ROUND(sa_pre / na_pre, 4) AS mean_a_pre,
         |  ROUND(sa_post / na_post, 4) AS mean_a_post,
         |  ROUND(sb_pre / nb_pre, 4) AS mean_b_pre,
         |  ROUND(sb_post / nb_post, 4) AS mean_b_post,
         |  ROUND((sb_post / nb_post - sb_pre / nb_pre)
         |    - (sa_post / na_post - sa_pre / na_pre), 4) AS did_estimate
         |FROM m""".stripMargin,

    "c148_winsorized_mean" -> {
      val loExpr = s"CAST(floor((n - 1) * $WinsorP) AS BIGINT) + 1"
      val hiExpr = s"CAST(floor((n - 1) * ${1.0 - WinsorP}) AS BIGINT) + 1"
      s"""WITH ranked AS (
         |  SELECT event_type, value,
         |    CAST(row_number() OVER (PARTITION BY event_type
         |      ORDER BY value ASC, event_id ASC) AS BIGINT) AS rk,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM events
         |), cuts AS (
         |  SELECT event_type,
         |    min(CASE WHEN rk = $loExpr THEN value END) AS p_lo,
         |    min(CASE WHEN rk = $hiExpr THEN value END) AS p_hi,
         |    min(n) AS n
         |  FROM ranked GROUP BY event_type
         |)
         |SELECT e.event_type, min(c.n) AS n,
         |  min(p_lo) AS p_lo, min(p_hi) AS p_hi,
         |  CAST(SUM(CASE WHEN value < p_lo THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_clamped_low,
         |  CAST(SUM(CASE WHEN value > p_hi THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_clamped_high,
         |  ${Canon.oDavgFloor6("greatest(p_lo, least(p_hi, value))", "COUNT(*)")}
         |    AS winsorized_mean
         |FROM events e JOIN cuts c ON e.event_type = c.event_type
         |GROUP BY e.event_type
         |ORDER BY e.event_type ASC NULLS FIRST""".stripMargin
    },

    "b84_except_all" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n FROM (
        |  SELECT o_orderpriority, o_orderstatus FROM orders
        |  WHERE o_totalprice > 200000.0
        |  EXCEPT ALL
        |  SELECT o_orderpriority, o_orderstatus FROM orders
        |  WHERE o_totalprice > 350000.0
        |) GROUP BY o_orderpriority, o_orderstatus
        |ORDER BY o_orderpriority ASC NULLS FIRST,
        |  o_orderstatus ASC NULLS FIRST""".stripMargin,

    "b85_intersect_all" ->
      s"""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n FROM (
         |  SELECT o_orderpriority, o_orderstatus FROM orders
         |  WHERE o_totalprice > 200000.0
         |  INTERSECT ALL
         |  SELECT o_orderpriority, o_orderstatus FROM orders
         |  WHERE epoch_us(o_orderdate) <
         |    ${OrderDateMaxUs - 2L * 365L * DayUs}
         |) GROUP BY o_orderpriority, o_orderstatus
         |ORDER BY o_orderpriority ASC NULLS FIRST,
         |  o_orderstatus ASC NULLS FIRST""".stripMargin,

    "c151_lorenz_curve" ->
      """WITH pu AS (
        |  SELECT user_id, SUM(CAST(value AS DECIMAL(38,6))) AS v
        |  FROM events GROUP BY user_id
        |), ranked AS (
        |  SELECT v,
        |    ((CAST(row_number() OVER (ORDER BY v ASC, user_id ASC) AS BIGINT)
        |      - 1) * 10) // (count(*) OVER ()) AS decile
        |  FROM pu
        |), buckets AS (
        |  SELECT decile, COUNT(*) AS n_users, SUM(v) AS bv
        |  FROM ranked GROUP BY decile
        |), cum AS (
        |  SELECT decile, n_users, bv,
        |    SUM(bv) OVER (ORDER BY decile ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_v,
        |    SUM(bv) OVER () AS tot
        |  FROM buckets
        |)
        |SELECT decile, n_users,
        |  ROUND(CAST(bv AS DOUBLE) / CAST(tot AS DOUBLE), 4) AS share,
        |  ROUND(CAST(cum_v AS DOUBLE) / CAST(tot AS DOUBLE), 4) AS cum_share
        |FROM cum
        |ORDER BY decile ASC NULLS FIRST""".stripMargin,

    "c152_dau_mau" ->
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events
         |), dau AS (
         |  SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
         |), spine AS (SELECT DISTINCT day AS d FROM ud),
         |mau AS (
         |  SELECT d, COUNT(*) AS mau FROM (
         |    SELECT DISTINCT d, user_id
         |    FROM spine JOIN ud ON day > d - $MauDays AND day <= d
         |  ) GROUP BY d
         |)
         |SELECT day, dau, mau,
         |  ROUND(CAST(dau AS DOUBLE) / mau, 4) AS stickiness
         |FROM dau JOIN mau ON day = d
         |ORDER BY day ASC NULLS FIRST""".stripMargin)
}
