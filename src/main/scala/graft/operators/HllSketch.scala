package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ENGINE-REPLAYABLE HyperLogLog — the register-table formulation of
  * Flajolet et al. 2007 (PAPERS.md) over md5-derived hashes, built so
  * the ENTIRE pipeline (hash → register → merge → estimate) is a
  * deterministic public function both engines compute bit-for-bit
  * (round-15 verdict item 3: the previous `hll_sketch_agg` /
  * `approx_count_distinct` forms kept their register state
  * engine-private, which is WHY `agg_approx`/`agg_sketch_merge` were
  * the suite's last two rows-only entries — this is the
  * `agg_theta_sketch` md5 discipline extended from bottom-k to
  * registers).
  *
  * Anatomy (classic HLL, m = 2^p registers):
  *  - hash: the same 60-bit md5 prefix the theta/overlap estimators
  *    use (`conv(substr(md5(key),1,15),16,10)` — DuckDB:
  *    `('0x'||substr(md5(key),1,15))::UBIGINT`);
  *  - register index = top p bits; word w = low 48 bits; rho(w) =
  *    position of w's leftmost 1-bit in the 48-bit word = 49 −
  *    bitlength(w) (49 when w = 0) — `bin()` is minimal-width in both
  *    engines, so bitlength = length(bin(w)) exactly;
  *  - registers: max(rho) per (scope, idx) — a plain hash aggregate
  *    with map-side partials; max is associative/commutative, so the
  *    register table is EXACTLY merge-order-free (no sparse→dense
  *    promotion drift like DataSketches), and a union rollup is
  *    literally `max` over the slices' registers: mergeability is
  *    visible in the dataflow, and the register table itself is the
  *    few-KB artifact a production pipeline stages per day/partition;
  *  - estimate: alpha_m·m²·2⁶⁴ / Σ_j 2^(64−M_j), the zero registers
  *    contributing 2⁶⁴ each. Every term 2^(64−M_j) is a power of two
  *    ≤ 2⁶⁴, summed EXACTLY in DECIMAL(38,0) (a double sum would
  *    round once the magnitude range passes 53 bits and become
  *    order-dependent); the final alpha·2⁸⁸/total division is one
  *    IEEE double step on identical inputs. Linear-counting
  *    small-range correction (est ≤ 2.5m with empty registers):
  *    m·ln(m/V) — `ln` is the one non-IEEE-pinned step, guarded by
  *    the round(…, 2) output contract (libm drift is ~1 ulp ≈ 1e-13
  *    relative; a 0.005 rounding boundary sits ~10 orders above it).
  *    No large-range correction: it exists for 32-bit hash collision
  *    saturation near 2³²; 48-bit words push that regime past any
  *    corpus this library addresses (collision term n²/2⁴⁹).
  *
  * Scale shape: one narrow pass over the keyed rows, partial max per
  * (scope, idx) map-side — the exchange carries at most m rows per
  * scope per task whatever the corpus size; estimates read m-row
  * frames. Accuracy: σ ≈ 1.04/√m ≈ 1.6 % at the default p = 12
  * (spec-gated against the exact twins).
  */
object HllSketch {

  /** Register-count exponent: m = 2^12 = 4096 registers (~4 KB per
    * scope) — σ ≈ 1.6 %, the accuracy/state point production HLLs
    * default to (Redis/BigQuery use p 12–15). */
  val P: Int = 12
  val M: Int = 1 << P

  /** Register-word width and divisor: the p index bits are the TOP
    * bits of the 60-bit hash, so idx = h60 div 2^(60−p) and the word
    * w = h60 mod 2^(60−p) is (60−p) bits wide — 48 at p = 12, giving
    * rho ∈ [1, 49]. */
  private val WordBits: Int = 60 - P
  private val WordDiv: Long = 1L << WordBits
  private val RhoMax: Int = WordBits + 1

  /** (scope, idx, r) register table for `key` grouped by `scope` —
    * max(rho) per register, NULL keys carry no identity and are
    * dropped (both engines). */
  def registers(df: DataFrame, scope: Column, key: Column): DataFrame =
    df.filter(key.isNotNull)
      .select(scope.as("scope"),
        graft.functions.Md5LongPrefix.md5_prefix(key.cast("string"), 15)
          .as("h60"))
      .select(col("scope"),
        expr(s"h60 DIV $WordDiv").as("idx"),
        (col("h60") % lit(WordDiv)).as("w"))
      .groupBy(col("scope"), col("idx"))
      // rho via [[graft.functions.LongBinLength]] — value-identical to
      // `length(bin(w))` with no per-row binary-string materialization
      // (round-16; the oracle twin below keeps the bin() form)
      .agg(max(when(col("w") === 0, lit(RhoMax))
        .otherwise(lit(RhoMax) -
          graft.functions.LongBinLength.long_bin_length(col("w")))).as("r"))

  /** The union rollup: max over every scope's registers — the merge
    * step of any production staged-sketch pipeline, as visible SQL. */
  def unionRegisters(regs: DataFrame, scopeName: String): DataFrame =
    regs.groupBy(col("idx")).agg(max(col("r")).as("r"))
      .select(lit(scopeName).as("scope"), col("idx"), col("r"))

  /** (scope, est) estimates from a register table — exact-decimal
    * harmonic sum, IEEE tail, linear-counting branch (see the object
    * scaladoc). `est` is rounded to 2 decimals (the cross-engine `ln`
    * guard). */
  def estimates(regs: DataFrame): DataFrame =
    regs.groupBy(col("scope"))
      .agg(count(lit(1)).as("nz"),
        sum(expr("CAST(pow(2.0, 64 - r) AS DECIMAL(38,0))")).as("sp"))
      .withColumn("v", lit(M) - col("nz"))
      .withColumn("total",
        col("sp") + expr("CAST(v AS DECIMAL(6,0)) * CAST(pow(2.0, 64.0) AS DECIMAL(20,0))"))
      .withColumn("raw",
        (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(M.toDouble))) *
          pow(lit(2.0), lit((2 * P + 64).toDouble)) / col("total").cast("double"))
      .withColumn("est",
        when(col("raw") <= lit(2.5 * M) && col("v") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("v").cast("double")))
          .otherwise(col("raw")))
      .select(col("scope"), round(col("est"), 2).as("est"))

  /** The DuckDB twin of registers+union+estimates as CTEs over
    * `src(scope, key)` — yields `hest(scope, est)` including the
    * '`allScope`' union rollup. ONE copy of the SQL so the engine and
    * every oracle consumer can never drift. */
  def oracleCtes(srcSql: String, allScope: String): String =
    s"""hh AS (
       |  SELECT scope,
       |         CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) AS h60
       |  FROM ($srcSql) WHERE key IS NOT NULL),
       |hb AS (SELECT scope, h60 // $WordDiv AS idx, h60 % $WordDiv AS w FROM hh),
       |hregs AS (
       |  SELECT scope, idx,
       |         max(CASE WHEN w = 0 THEN $RhoMax ELSE $RhoMax - length(bin(w)) END) AS r
       |  FROM hb GROUP BY scope, idx),
       |hall AS (SELECT '$allScope' AS scope, idx, max(r) AS r FROM hregs GROUP BY idx),
       |hreg2 AS (SELECT * FROM hregs UNION ALL SELECT * FROM hall),
       |hsum AS (
       |  SELECT scope, count(*) AS nz,
       |         sum(CAST(pow(2, 64 - r) AS DECIMAL(38,0))) AS sp
       |  FROM hreg2 GROUP BY scope),
       |hest AS (
       |  SELECT scope,
       |         round(CASE WHEN raw <= 2.5 * $M AND v > 0
       |                    THEN CAST($M AS DOUBLE) * ln(CAST($M AS DOUBLE) / v)
       |                    ELSE raw END, 2) AS est
       |  FROM (SELECT scope, v,
       |               (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / $M))
       |                 * pow(2, ${2 * P + 64}) / CAST(total AS DOUBLE) AS raw
       |        FROM (SELECT scope, $M - nz AS v,
       |                     sp + CAST($M - nz AS DECIMAL(6,0)) * CAST(pow(2, 64) AS DECIMAL(20,0)) AS total
       |              FROM hsum)))""".stripMargin
}
