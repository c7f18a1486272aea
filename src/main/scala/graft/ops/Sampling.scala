package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, hash-keyed sampling and dataset splitting for training
 * pipelines (train/val/test assignment, per-source mixing rates).
 *
 * Membership is a pure function of (key, seed): bucket = the first 8 hex
 * chars of `md5(key || ':' || seed)`, compared lexicographically against
 * a fraction threshold (lowercase hex compares identically to the
 * numeric value). Unlike `df.sample`/`sampleBy` — whose per-partition
 * RNG draws change under repartitioning, task retries, or data appends —
 * a hash bucket gives every row a stable assignment: re-running the
 * pipeline on 100 TB, on a different cluster layout, or after an
 * incremental append keeps every previously-assigned row in the same
 * split. That stability is what makes held-out sets trustworthy.
 *
 * Scale: a per-row codegen'd projection/filter — no shuffle, no state,
 * no skew sensitivity; composes with any downstream partitioning.
 *
 * Reference scope note: the reference engine (datafusion-wasm
 * `src/core.rs:34-99`) exposes no sampling API — this family is part of
 * the training-data-pipeline surface the build charter adds on top.
 */
object Sampling {

  /** First 8 md5 hex chars of `'k' + key + ':' + seed` — a uniform
    * 32-bit bucket in hex-string form (portable: any engine with md5
    * derives the same). A NULL key is treated as one more key VALUE,
    * hashed as `'n:' + seed`: all null-key rows share a bucket —
    * identical keys always co-assign, that is the contract — rather
    * than falling through null-comparison semantics (which silently
    * sent them all to the LAST split and dropped them from rate<1
    * strata, r04 review). The null encoding is OUT-OF-BAND: every
    * non-null key is prefixed 'k', so no real key value can collide
    * with the null bucket (an in-band sentinel string could, ADVICE
    * r04). Use a unique non-null key when null-key rows must spread. */
  def bucketHex(key: Column, seed: Int): Column =
    substring(md5(concat(
      when(key.isNull, lit("n"))
        .otherwise(concat(lit("k"), key.cast("string"))),
      lit(":" + seed))), 1, 8)

  /** Hex threshold t(f): bucketHex < t(f) selects a fraction f of keys
    * (f of the 2^32 bucket space, exactly). Only meaningful for f in
    * [0, 1); callers treat f >= 1 as always-true. */
  def hexThreshold(f: Double): String = {
    require(f >= 0.0 && f < 1.0, s"fraction must be in [0,1), got $f")
    // clamp: f within 2^-33 of 1 would round to 2^32 = "100000000", a
    // 9-char string that INVERTS the 8-char lexicographic compare
    f"${math.min((f * 4294967296.0).round, 4294967295L)}%08x"
  }

  /** Adds a `split` column assigning each row to one of `splits` (name →
    * weight, weights summing to 1) by its key's hash bucket. The last
    * split is the unconditioned remainder, so float dust in the
    * cumulative sum can never leave a row unassigned. */
  def deterministicSplit(df: DataFrame, key: Column,
      splits: Seq[(String, Double)], seed: Int = 42): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.map(_._2).forall(_ > 0.0), "split weights must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val hex = bucketHex(key, seed)
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val conds = splits.init.zip(cum.init).map { case ((name, _), c) =>
      // float dust can push an interior cumulative weight to exactly 1.0
      // (e.g. 0.5 + 0.5 + 1e-10) — clamp below 1 so hexThreshold's
      // domain require doesn't fire; the clamp only moves the boundary
      // by < 1 bucket in 2^32
      (lit(name), hex < lit(hexThreshold(math.min(c, 1.0 - 1e-12))))
    }
    val assigned = conds.tail.foldLeft(when(conds.head._2, conds.head._1)) {
      case (acc, (name, cond)) => acc.when(cond, name)
    }.otherwise(lit(splits.last._1))
    df.withColumn("split", assigned)
  }

  /** Leakage-safe split: [[deterministicSplit]] keyed on a GROUP
    * attribute (source domain, site, author) instead of the row id, so
    * every row of a group lands in the SAME split. Splitting by row id
    * leaks when near-duplicates cluster within a group — a train doc's
    * sibling lands in test and the eval measures memorization; keying
    * the bucket on the group makes straddling impossible by
    * construction, not by post-hoc filtering. Same portable md5
    * bucket, same pure-projection scale shape (no shuffle, stable
    * under re-runs/appends); group sizes skew the realized row
    * fractions, so weights govern the GROUP allocation, not rows. */
  def groupSplit(df: DataFrame, group: Column,
      splits: Seq[(String, Double)], seed: Int = 42): DataFrame =
    deterministicSplit(df, group, splits, seed)

  /** EXACT-k deterministic sample per stratum — eval/calibration set
    * construction, where "about 10%" ([[stratifiedSample]]) is the
    * wrong contract and "exactly k docs per language" is the right
    * one: each stratum keeps the k rows whose portable md5 bucket
    * ([[bucketHex]]) orders smallest (ties broken by `key`). The
    * selection is a pure function of (key values, seed) — stable
    * across re-runs and engines — but NOT append-stable: a new row
    * whose hash orders below a survivor displaces it (rate-based
    * sampling keeps per-row stability; exact-k trades it for the exact
    * count). `key` should be row-unique — rows SHARING a key value tie
    * beyond the ordering and the survivor among them is arbitrary.
    *
    * 100 TB shape: a per-stratum row_number filter, which Spark plans
    * as WindowGroupLimit — per-partition top-k heaps BEFORE the window
    * shuffle, so each partition contributes at most k rows per stratum
    * to the exchange regardless of corpus size (spec-pinned). */
  def sampleExactK(df: DataFrame, strata: Column, key: Column, k: Int,
      seed: Int = 42): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata).orderBy(bucketHex(key, seed), key)
    df.withColumn("__smp_rn", row_number().over(w))
      .filter(col("__smp_rn") <= k)
      .drop("__smp_rn")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-Res): keep exactly `k` rows with inclusion probability
    * proportional to `weight` — quality-weighted corpus subsampling
    * where [[sampleExactK]]'s uniform draw is the wrong contract
    * ("sample 1M docs, favoring high quality scores" rather than "1M
    * docs uniformly"). Each row draws the deterministic hash-uniform
    * `u = (bucket+1)/2³²` in (0, 1] from [[bucketHex]] and scores
    * `samp_key = −ln(u)/w` (the exponential arrival-time view); the k
    * SMALLEST keys win, ties broken by `key`. Selection is a pure
    * function of (key values, weights, seed) — stable across re-runs,
    * partitionings, and engines. Rows with NULL or non-positive weight
    * are excluded (they cannot be drawn under ∝ w). Appends are not
    * stable (the exact-k trade, as [[sampleExactK]]).
    *
    * Determinism: the hex bucket converts to an exact double (< 2³² ≪
    * 2⁵³), `ln` pins @7 (the r07 transcendental contract), the divide
    * is IEEE-exact, and the emitted key rounds @9 then normalizes
    * `−0.0 → 0.0` (`+ 0.0`) so the u = 1 edge stringifies identically
    * in both engines. The ORDER uses the same emitted key, so the
    * selected set and its order restate in one SQL sort.
    *
    * 100 TB shape: a pure per-row projection, then
    * `TakeOrderedAndProject` — per-partition top-k heaps, no global
    * sort, nothing corpus-sized shuffles. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
      seed: Int = 42): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    withAresKey(df, key, weight, seed)
      .orderBy(col("samp_key"), key)
      .limit(k)
  }

  /** Per-STRATUM weighted sampling without replacement: the
    * [[weightedSample]] A-Res draw ranked WITHIN each stratum — exactly
    * `min(k, stratum positive-weight size)` rows per group, inclusion
    * ∝ weight inside its group ("10k docs per language, favoring
    * quality"). Same determinism and NaN/non-positive-weight exclusion
    * contract as [[weightedSample]].
    *
    * 100 TB shape: a per-stratum row_number filter over the projected
    * key, which Spark plans as WindowGroupLimit — per-partition top-k
    * heaps BEFORE the window shuffle, the [[sampleExactK]] shape
    * (plan-pinned there). */
  def weightedSamplePerGroup(df: DataFrame, strata: Column, key: Column,
      weight: Column, k: Int, seed: Int = 42): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(strata).orderBy(col("samp_key"), key)
    withAresKey(df, key, weight, seed)
      .withColumn("__ws_rn", row_number().over(win))
      .filter(col("__ws_rn") <= k)
      .drop("__ws_rn")
  }

  /** Shared A-Res scoring projection: filters NULL/NaN/non-positive
    * weights (NaN orders above every double in Spark, so `w > 0` alone
    * would admit it) and adds `samp_key = −ln@7(u)/w` rounded @9 with
    * `−0.0` normalized — one definition of the draw for
    * [[weightedSample]] / [[weightedSamplePerGroup]] /
    * [[dedupWeightedSample]]. */
  private def withAresKey(df: DataFrame, key: Column, weight: Column,
      seed: Int): DataFrame = {
    val w = weight.cast("double")
    val b = conv(bucketHex(key, seed), 16, 10).cast("double")
    val u = (b + lit(1.0)) / lit(4294967296.0)
    df.filter(w.isNotNull && !isnan(w) && w > lit(0.0))
      .withColumn("samp_key",
        Portable.r9(-round(log(u), 7) / w) + lit(0.0))
  }

  /** Duplicate-aware "soft dedup" sampling: [[weightedSample]] with
    * weight `1 / cluster_size` over exact-text clusters, so each UNIQUE
    * text carries total inclusion mass 1 no matter how many copies the
    * crawl delivered — the middle ground between keeping duplicates
    * (frequency bias toward boilerplate) and hard dedup (losing the
    * natural-distribution signal entirely). Emits the input columns
    * plus `(cluster_size, samp_key)`; NULL-text docs are their own
    * cluster of 1 (the exactPairs contract — they are never
    * duplicates).
    *
    * Scale: the cluster-size aggregate is [[Dedup.exactByHash]]'s
    * 8-byte-key shuffle; the join back is hash-keyed; then the
    * [[weightedSample]] projection + TakeOrderedAndProject. Weights
    * derive in-plan — nothing collects. */
  def dedupWeightedSample(docs: DataFrame, k: Int,
      seed: Int = 42): DataFrame = {
    val sizes = docs.filter(col("text").isNotNull)
      .groupBy(xxhash64(col("text")).as("__dw_h"))
      .agg(count(lit(1)).as("__dw_n"))
    val weighted = docs
      .withColumn("__dw_h",
        when(col("text").isNotNull, xxhash64(col("text"))))
      .join(sizes, Seq("__dw_h"), "left")
      .withColumn("cluster_size", coalesce(col("__dw_n"), lit(1L)))
      .withColumn("__dw_w", lit(1.0) / col("cluster_size"))
    weightedSample(weighted, col("doc_id"), col("__dw_w"), k, seed)
      .drop("__dw_h", "__dw_n", "__dw_w")
  }

  /** Split-LEAKAGE audit — the measurement that motivates [[groupSplit]]:
    * given a duplicate/near-duplicate pair set and a frame carrying a
    * `split` assignment, counts pairs per (split_a, split_b) with the
    * pair normalized `split_a <= split_b`. Off-diagonal mass IS train/
    * test leakage: a duplicate straddling the boundary lets the eval
    * measure memorization. Run it against a row-keyed
    * [[deterministicSplit]] to quantify the leak and against
    * [[groupSplit]] to prove the zero (x81 does both in one row).
    *
    * Scale: two id-keyed joins of the PAIR set (bounded by actual
    * duplicates) against `(id, split)` projections — the corpus never
    * shuffles; the final aggregate is |splits|² rows. */
  def splitLeakage(pairs: DataFrame, assigned: DataFrame): DataFrame = {
    val s = assigned.select(col("doc_id"), col("split"))
    pairs
      .join(s.select(col("doc_id").as("doc_a"), col("split").as("__sl_a")),
        "doc_a")
      .join(s.select(col("doc_id").as("doc_b"), col("split").as("__sl_b")),
        "doc_b")
      .select(least(col("__sl_a"), col("__sl_b")).as("split_a"),
        greatest(col("__sl_a"), col("__sl_b")).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("split_a"), col("split_b"))
  }

  /** Deterministic shard id in [0, n): the hash bucket's position among
    * n equal-width threshold cells, computed as a sum of n-1 codegen'd
    * hex comparisons — no numeric hex parsing needed, so any engine
    * with md5 and string compare derives the same shard (the x20
    * oracle restates the CASE chain). Evaluated as a BINARY-SEARCH
    * `when` tree over the thresholds — CaseWhen branches are lazy, so
    * each row pays log₂(n) comparisons; the flat sum-of-comparisons
    * form evaluated all n−1 per row and measured 60× slower at n=256
    * (r04 review). The hex also rides through a generator barrier so
    * md5 evaluates once per row. Sharding a 100 TB corpus for a
    * training run is a pure per-row projection: no shuffle, stable
    * under re-runs and appends; write with
    * `df.repartition(n, col("shard"))` or partitionBy to materialize. */
  def shard(df: DataFrame, key: Column, n: Int, seed: Int = 42,
      outName: String = "shard"): DataFrame = {
    require(n >= 1 && n <= 4096, s"shard count $n outside [1, 4096]")
    val hex = col("__graft_shard_hex")
    // shard ids in [lo, hi]; descend on the boundary threshold between
    // the halves (shard s covers hex in [t(s/n), t((s+1)/n)))
    def tree(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi + 1) / 2
        when(hex >= lit(hexThreshold(mid.toDouble / n)), tree(mid, hi))
          .otherwise(tree(lo, mid - 1))
      }
    df.withColumn("__graft_shard_hex", explode(array(bucketHex(key, seed))))
      .withColumn(outName, tree(0, n - 1))
      .drop("__graft_shard_hex")
  }

  /** Deterministic global shuffle key: ORDER BY this column (then the
    * key as tiebreak) is a reproducible corpus-wide permutation — a
    * distributed range sort, NOT a single-partition row_number. Vary
    * `seed` per epoch for fresh orders with zero RNG state. */
  def shuffleKey(key: Column, seed: Int = 42): Column = bucketHex(key, seed)

  /** In-plan form of `hexThreshold` for a rate computed inside the query
    * (no driver round-trip): the same floor(f·2³² + 0.5) with the same
    * 2³²−1 clamp, rendered as 8 lowercase hex chars. floor(x+0.5) rather
    * than round() so every engine with md5/hex/floor derives the
    * identical threshold (round()'s half-even vs half-away conventions
    * diverge across engines; floor doesn't). */
  private def hexThresholdCol(rate: Column): Column =
    lpad(lower(hex(least(floor(rate * lit(4294967296.0) + lit(0.5)),
      lit(4294967295.0)).cast("long"))), 8, "0")

  /**
   * Domain-mixture sampling to a weight budget — the data-mixing step of
   * a training pipeline ("sample each source so the kept corpus hits
   * these proportions under this total token budget"). Each domain `d`
   * in `targets` keeps the deterministic fraction
   * `rate_d = min(1, targets(d) · budget / Σ weight over d)` of its
   * rows, selected by the same portable md5 bucket as
   * `deterministicSplit` — so the sample is stable under re-runs,
   * repartitioning, and cluster layout, and any engine with md5 can
   * reproduce the exact row set. Domains absent from `targets` (and
   * null domains) are dropped — that is the mixture contract: only the
   * listed sources participate. Rows gain a `keep_rate` column (the
   * domain's rate, rounded to 9 digits) for auditability.
   *
   * Scale shape: the per-domain totals are one map-side-combining
   * aggregate whose result is |domains| rows; rates derive in-plan and
   * broadcast back onto the corpus, so the main pass is a broadcast
   * join + codegen'd filter — the corpus itself never shuffles and
   * nothing corpus-sized reaches the driver. Sampling by row weight
   * (not row count) means heavy documents and light documents are
   * kept at the same RATE; the realized weight share per domain
   * converges to the target by uniformity of the hash bucket.
   */
  def mixtureSample(df: DataFrame, domain: Column, weight: Column,
      targets: Map[String, Double], budget: Double, key: Column,
      seed: Int = 42): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(_ > 0.0), "target shares must be positive")
    require(budget > 0.0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    val targetRows = spark.createDataFrame(targets.toSeq.sortBy(_._1))
      .toDF("__mix_domain", "__mix_share")
    val totals = df.groupBy(domain.as("__mix_domain"))
      .agg(sum(weight).as("__mix_total"))
    val rates = totals.join(targetRows, "__mix_domain")
      .select(col("__mix_domain"),
        least(lit(1.0), col("__mix_share") * lit(budget) /
          col("__mix_total").cast("double")).as("__mix_rate"))
    val hex = bucketHex(key, seed)
    // isNotNull is load-bearing: a null rate (domain whose weights are
    // all null) would clamp through Spark's null-ignoring least() in
    // hexThresholdCol to the max threshold and keep the row
    df.join(broadcast(rates), domain === col("__mix_domain"))
      .filter(col("__mix_rate").isNotNull &&
        (col("__mix_rate") >= lit(1.0) ||
          hex < hexThresholdCol(col("__mix_rate"))))
      .withColumn("keep_rate", Portable.r9(col("__mix_rate")))
      .drop("__mix_domain", "__mix_rate")
  }

  /**
   * Temperature-scaled (α) domain mixture — the "sampling temperature"
   * recipe multilingual/LM pipelines use when the mixture proportions
   * should derive from the DATA rather than a hand-written target map
   * (the public recipe: shares ∝ size^α, α < 1 up-weights small domains;
   * α = 1 is proportional sampling, α → 0 approaches uniform). Each
   * domain keeps the deterministic fraction
   *
   *   rate_d = round(min(1, share_d · budget / total_d), 9),
   *   share_d = total_d^α / Σ_e total_e^α
   *
   * of its rows, selected by the same portable md5 bucket as
   * [[mixtureSample]] (stable under re-runs, repartitioning, appends;
   * reproducible by any engine with md5). Null domains are dropped —
   * the mixture contract, as in [[mixtureSample]]. Rows gain the
   * domain's `keep_rate`.
   *
   * The round-to-9 on the rate is part of the CONTRACT, not cosmetics:
   * `pow` is the one non-exactly-rounded IEEE operation in the
   * derivation (JVM `Math.pow` and libm can disagree in the last ulp,
   * and the Σ over domains accumulates in arbitrary order), so the rate
   * is pinned to 9 digits BEFORE the threshold derives from it — the
   * kept row set stays cross-engine and cross-run reproducible.
   *
   * Scale shape: one map-side-combining aggregate to |domains| rows;
   * the share normalization is a window over that TINY frame (a single
   * aggregation subtree — a separate Σ-join would scan the corpus
   * twice); rates broadcast back onto the corpus, so the main pass is a
   * broadcast join + codegen'd filter with no corpus shuffle.
   */
  def temperatureMixture(df: DataFrame, domain: Column, weight: Column,
      alpha: Double, budget: Double, key: Column, seed: Int = 42): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(budget > 0.0, s"budget must be positive, got $budget")
    val t = col("__mix_total").cast("double")
    val rates = df.filter(domain.isNotNull)
      .groupBy(domain.as("__mix_domain"))
      .agg(sum(weight).as("__mix_total"))
      // same r10 treatment as mixturePlan (measured there at sf0.001):
      // pow is not correctly rounded across libms and a float Σ is
      // addition-order-dependent — pin the transcendental @7 (floor
      // form) and accumulate z exactly in DECIMAL so the rate quotient
      // is bit-identical IEEE before its own floor-form @9
      .withColumn("__mix_p",
        floor(pow(t, lit(alpha)) * lit(1.0e7) + lit(0.5)) / lit(1.0e7))
      .withColumn("__mix_z", sum(col("__mix_p")
          .cast(org.apache.spark.sql.types.DecimalType(28, 7)))
        .over(org.apache.spark.sql.expressions.Window.partitionBy())
        .cast("double"))
      // nullif guards (mirroring mixturePlan's r10 treatment): a
      // zero-weight domain (t=0, z>0) or an all-zero corpus (z=0) has no
      // rate — 0/0 is NaN, and Spark's NaN-is-largest ordering would let
      // least(1.0, NaN) silently keep the domain at rate 1.0. The null
      // must gate OUTSIDE least (null-IGNORING, it would fall back to
      // the 1.0 literal — the very clamp mixtureSample's guard comment
      // warns about), so a when() holds the degenerate rate null and the
      // existing isNotNull filter drops the domain.
      .withColumn("__mix_raw",
        col("__mix_p") / nullif(col("__mix_z"), lit(0.0)) * lit(budget)
          / nullif(t, lit(0.0)))
      .select(col("__mix_domain"),
        when(col("__mix_raw").isNotNull,
          floor(least(lit(1.0), col("__mix_raw"))
            * lit(1.0e9) + lit(0.5)) / lit(1.0e9)).as("__mix_rate"))
    val hex = bucketHex(key, seed)
    // same null-rate guard as mixtureSample (see there)
    df.join(broadcast(rates), domain === col("__mix_domain"))
      .filter(col("__mix_rate").isNotNull &&
        (col("__mix_rate") >= lit(1.0) ||
          hex < hexThresholdCol(col("__mix_rate"))))
      .withColumn("keep_rate", col("__mix_rate"))
      .drop("__mix_domain", "__mix_rate")
  }

  /** The mixture PLANNING table behind [[temperatureMixture]] — per
    * domain: its token mass, temperature-scaled share (∝ tokensᵅ),
    * target token allocation under `budget`, the sampling rate that
    * realizes it, and `epochs` = ⌈rate⌉ (a rate above 1 means the
    * domain must repeat — the capacity warning a mixture designer
    * reads BEFORE launching the 100 TB sampling pass). Same r10
    * determinism contract as [[temperatureMixture]]: pow pinned @7
    * (floor form), normalizer accumulated in DECIMAL, every derived
    * double floor-rounded @9, and `epochs` is the ceiling of the
    * ROUNDED rate. NULL domains are excluded (un-attributable mass
    * cannot be allocated).
    *
    * Scale: one map-side-combining aggregate to |domains| rows; the
    * normalization window runs over that tiny frame. The corpus is
    * scanned exactly once. */
  def mixturePlan(df: DataFrame, domain: Column, weight: Column,
      budget: Double, alpha: Double = 1.0): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(budget > 0.0, s"budget must be positive, got $budget")
    val t = col("tokens").cast("double")
    // nullif: an all-zero-weight corpus has no distribution to plan —
    // shares come back null (honest), where 0/0 would be NaN and the
    // r10 floor-form rounding would silently coerce NaN to 0 (Spark's
    // floor on double returns LONG; NaN.toLong is 0)
    val share = col("__mp_p") / nullif(col("__mp_z"), lit(0.0))
    df.filter(domain.isNotNull)
      .groupBy(domain.as("domain"))
      .agg(sum(weight).as("tokens"))
      // pow() is the one non-IEEE-exact op here (JVM vs libm differ in
      // the last ulp — the x48 pow-ulp contract), and a float SUM of
      // the pps is addition-order-dependent; the r10 sf0.001 probe
      // measured the resulting one-ulp z flipping target_tokens' last
      // digit. Standard repo treatment: pin the transcendental at @7
      // (floor form — no round() convention) and accumulate the
      // normalizer exactly in DECIMAL, so share = pp/z is bit-identical
      // IEEE on both engines.
      .withColumn("__mp_p",
        floor(pow(t, lit(alpha)) * lit(1.0e7) + lit(0.5)) / lit(1.0e7))
      .withColumn("__mp_z", sum(col("__mp_p")
          .cast(org.apache.spark.sql.types.DecimalType(28, 7)))
        .over(org.apache.spark.sql.expressions.Window.partitionBy())
        .cast("double"))
      .select(col("domain"), col("tokens"),
        // floor(x·10⁹+0.5)/10⁹ instead of round(x, 9) (r10): pow() is
        // correctly-rounded enough to be bit-identical cross-engine,
        // but the sf0.001 probe measured a target_tokens quotient whose
        // shortest repr ends in '5' at digit 10 — Spark's HALF_UP and
        // DuckDB's scaled round split exactly there. The floor form is
        // pure IEEE arithmetic both engines compute identically (the
        // hexThresholdCol precedent); all quantities are nonnegative so
        // toward-+∞ halves equal half-away-from-zero.
        (floor(share * lit(1.0e9) + lit(0.5)) / lit(1.0e9)).as("share"),
        (floor(share * budget * lit(1.0e9) + lit(0.5)) / lit(1.0e9))
          .as("target_tokens"),
        (floor(share * budget / t * lit(1.0e9) + lit(0.5)) / lit(1.0e9))
          .as("rate"))
      .withColumn("epochs", ceil(col("rate")).cast("int"))
      .orderBy(col("domain"))
  }

  /** Materialize a repetition plan: each row emits `(row, epoch)` copies
    * for epochs `1..⌈rate⌉` — full epochs `1..⌊rate⌋` unconditionally,
    * plus the fractional epoch `⌊rate⌋+1` kept with probability
    * `rate − ⌊rate⌋` by the portable md5 bucket keyed on `(key, epoch)`
    * — the data-constrained multi-epoch layout ([[mixturePlan]] computes
    * `epochs = ⌈rate⌉`; this operator ACTS on it; rate < 1 degenerates
    * to plain mixture sampling). Rows with NULL or non-positive rate
    * drop (the mixture contract). The epoch rides in the draw key so
    * fractional-epoch selection is independent of any same-seed
    * row-level sampler; NULL keys share one draw per epoch
    * ([[bucketHex]]'s null contract). `epoch` is BIGINT.
    *
    * 100 TB shape: a pure projection + one bounded `sequence` Generate —
    * no shuffle, no join (rates are expected to already ride the rows,
    * via the broadcast join that attached them); output size is exactly
    * Σ⌈rate⌉, the training-set size the plan promised. */
  def epochRepeat(df: DataFrame, key: Column, rate: Column,
      seed: Int = 42): DataFrame = {
    val r = rate.cast("double")
    df.filter(r.isNotNull && r > 0.0)
      .withColumn("epoch", explode(sequence(lit(1L), ceil(r))))
      .filter(col("epoch") <= floor(r) ||
        bucketHex(concat(key.cast("string"), lit("#"),
          col("epoch").cast("string")), seed) < hexThresholdCol(r - floor(r)))
  }

  /**
   * Time-decay (recency-weighted) sampling: each row keeps with
   * probability `2^(−age / halflife)` where `age = refTs − ts` — the
   * standard recency weighting when stitching crawl snapshots into a
   * training mix (yesterday's crawl keeps ~everything, a
   * halflife-old one keeps half). Selection is the same portable md5
   * bucket as every sampler here; rows gain their `keep_rate`.
   *
   * `refTs` is an explicit column/literal, NOT a wall-clock read — the
   * kept set must be a pure function of the data so re-runs and
   * engines agree (pass e.g. the corpus max-ts via a scalar subquery,
   * or a pinned cutoff literal). Rows newer than `refTs` clamp to
   * rate 1; rows with a NULL timestamp drop (an unknown age cannot be
   * weighted — pre-filter them if they must be kept).
   *
   * The rate is rounded to 9 digits BEFORE thresholding — the same
   * pow-ulp contract as [[temperatureMixture]]. Scale: a pure per-row
   * codegen'd projection/filter, no shuffle, no state.
   */
  def decaySample(df: DataFrame, ts: Column, refTs: Column,
      halflifeSeconds: Double, key: Column, seed: Int = 42): DataFrame = {
    require(halflifeSeconds > 0.0,
      s"halflife must be positive, got $halflifeSeconds")
    val ageSec = (unix_micros(refTs) - unix_micros(ts)).cast("double") /
      lit(1000000.0)
    // NOT functions.greatest: Spark's greatest IGNORES nulls, so a null
    // timestamp would clamp to age 0 and keep at rate 1 — the when-form
    // propagates null (matching SQL GREATEST), and the filter then
    // drops the row as documented
    val clamped = when(ageSec < lit(0.0), lit(0.0)).otherwise(ageSec)
    val rate = Portable.r9(pow(lit(2.0), -clamped / lit(halflifeSeconds)))
    // the explicit isNotNull is load-bearing: a null rate reaching
    // hexThresholdCol would clamp through Spark's null-IGNORING least()
    // to the max threshold and keep the row
    df.withColumn("keep_rate", rate)
      .filter(col("keep_rate").isNotNull &&
        (col("keep_rate") >= lit(1.0) ||
          bucketHex(key, seed) < hexThresholdCol(col("keep_rate"))))
  }

  /** Keeps a per-stratum fraction of rows (stratum → rate; strata absent
    * from `rates` keep `defaultRate`). Rates >= 1 keep everything. */
  def stratifiedSample(df: DataFrame, strata: Column, rates: Map[String, Double],
      key: Column, seed: Int = 42, defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0),
      "rates must be non-negative")
    val hex = bucketHex(key, seed)
    def keep(rate: Double): Column =
      if (rate >= 1.0) lit(true) else hex < lit(hexThreshold(rate))
    val sorted = rates.toSeq.sortBy(_._1) // deterministic plan text
    val cond = sorted.foldRight(keep(defaultRate)) { case ((s, r), els) =>
      when(strata === lit(s), keep(r)).otherwise(els)
    }
    df.filter(cond)
  }
}
