package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bit-stable gradient-boosted-stump forecaster — the NONLINEAR rung of
  * the ML-1 surface (VERDICT r10 #4: the reference's 2×LSTM(50)+Dense(5),
  * `lvmh_forecaster2.py:62-71`, is a nonlinear lag→horizon map; the ridge
  * rung is linear by construction). Boosted depth-1 regression trees over
  * the seqLen lag features CAN bend: each stump is a step function of one
  * lag, and their sum approximates any piecewise-constant response, which
  * is exactly the class of nonlinearity a fixed-grid price series
  * exhibits between retrains.
  *
  * Like [[StableRidge]], the whole fit is a deterministic function of the
  * input SET — same numbers under any partitioning, shuffle order, AQE
  * re-plan, or engine — which is what makes `ml1_boost_forecast` a full
  * hash-oracle query rather than a contract-tested one. The trick is the
  * same 2^-26 grid, pushed further: the ENTIRE residual pipeline stays in
  * integer grid units.
  *
  *  1. Quantize scaled features/labels: `q = floor(x·2^26 + 0.5)` —
  *     pointwise, IEEE-exact.
  *  2. Base score per horizon step: `F0 = snap(Σqy, n)` where
  *     `snap(s, m) = floor(toDouble(s)/m + 0.5)` — an integer mean on the
  *     grid. Residuals `rq = qy − F0` are integers.
  *  3. Each round, for every candidate split (lag j ∈ 1..seqLen,
  *     threshold k/8, k ∈ 1..7 — a FIXED grid, exact on the scale
  *     `thrQ = k·2^23` since scaled features live in [0,1]): the left-side
  *     count and EXACT integer residual sum. Leaf values are grid-snapped
  *     means (`mL = snap(sL, nL)`), the split score is the exact integer
  *     `mL²·nL + mR²·nR` (the SSE-reduction surrogate with means snapped
  *     first, so cross-candidate comparison is integer, never float), ties
  *     to smaller (j, k). A candidate with an empty side scores −1 and
  *     zero leaves, so it is only chosen when every split is degenerate —
  *     and then it is a no-op.
  *  4. Residual update `rq ← rq − leaf(x)` is integer; prediction is
  *     `(F0 + Σ leaf_t(x)) / 2^26`, then the usual inverse min-max scale.
  *
  * The only float ops are the per-side mean (exact-integer-to-double
  * conversion, one divide, one add, one floor — each IEEE-deterministic,
  * replayed token-for-token by the generated SQL) and the final
  * prediction scale-back. Exactness bound for the SQL mirror: the plain
  * `CAST(sum AS DOUBLE)` is exact while `|Σrq| < 2^53`, i.e. up to ~2^25
  * samples — orders of magnitude past the oracle scales (sf0.01/sf0.1);
  * the Spark side uses a sign-aware hi/lo split and is exact at ANY n.
  *
  * Scale shape (the 100 TB story): the model is driver-side and tiny
  * (horizon × rounds stumps + horizon base scores); each round is ONE
  * map-side-combined pass over the cached quantized samples producing a
  * (seqLen·7 counts + horizon·seqLen·7 sums)-long summary — the MLlib GBT
  * iteration shape, no per-sample state, nothing collected but the
  * summary. Residuals are recomputed from the (broadcast-small) model
  * inside the pass rather than stored, so rounds compose without a
  * growing lineage. */
object StableBoost {

  import StableRidge.{Q, quantizeLong}

  /** Fixed threshold grid: k/8 for k ∈ 1..7, exact in grid units. */
  val ThresholdDenom = 8
  val ThrQ: IndexedSeq[Long] = (1 until ThresholdDenom).map(k => k * (Q / ThresholdDenom))

  /** One fitted stump on lag `j` (1-based): x_j ≤ thrQ → leafL else leafR
    * (leaves in grid units). */
  final case class Stump(j: Int, k: Int, leafL: Long, leafR: Long) {
    def thrQ: Long = ThrQ(k - 1)
    def apply(qx: Array[Long]): Long = if (qx(j - 1) <= thrQ) leafL else leafR
  }

  /** Exact sign-aware integer→double conversion (any magnitude): both
    * halves of |s| are < 2^53 after the split, so each converts exactly;
    * equals the plain conversion whenever |s| < 2^53 — which is the regime
    * the SQL mirror's CAST runs in. */
  private def toD(s: BigInt): Double = {
    val a = s.abs
    val hi = (a >> StableRidge.SplitPow).toDouble
    val lo = (a & BigInt(StableRidge.Split - 1)).toDouble
    val d = hi * StableRidge.Split.toDouble + lo
    if (s.signum < 0) -d else d
  }

  /** Grid-snapped integer mean — the ONE float excursion, canonical op
    * order `floor(toD(s)/m + 0.5)`, replayed by the SQL mirror. */
  private def snap(s: BigInt, m: Long): Long =
    math.floor(toD(s) / m.toDouble + 0.5).toLong

  /** Long partials folded into BigInt so integer sums are exact and
    * order-independent at any scale (the [[StableRidge]] GramAcc idiom). */
  private final class Acc(len: Int) extends Serializable {
    val big: Array[BigInt] = Array.fill(len)(BigInt(0))
    val part: Array[Long] = new Array[Long](len)
    var n: Int = 0
    var rows: Long = 0L
    def fold(): Unit = {
      var i = 0
      while (i < len) { if (part(i) != 0L) { big(i) += BigInt(part(i)); part(i) = 0L }; i += 1 }
      n = 0
    }
    def merge(o: Acc): Acc = {
      fold(); o.fold()
      var i = 0
      while (i < len) { big(i) += o.big(i); i += 1 }
      rows += o.rows
      this
    }
  }

  final class BoostModel(val seqLen: Int, val horizon: Int,
                         /** base(h): grid-units mean of step-h labels */
                         val base: Array[Long],
                         /** stumps(h): the boosting chain for step h */
                         val stumps: Array[Array[Stump]]) extends ForecastModel {
    /** Scaled-space prediction in grid units for a quantized window. */
    def predictQ(qx: Array[Long], h: Int): Long = {
      var s = base(h)
      var t = 0
      while (t < stumps(h).length) { s += stumps(h)(t)(qx); t += 1 }
      s
    }
    def predict(window: Array[Double]): Array[Double] = {
      require(window.length == seqLen, s"window must have $seqLen values")
      val qx = window.map(quantizeLong)
      Array.tabulate(horizon)(h => predictQ(qx, h).toDouble / Q.toDouble)
    }
  }

  private def nCand(seqLen: Int): Int = seqLen * (ThresholdDenom - 1)

  /** Pick the best stump for one horizon step from the exact per-candidate
    * summaries. `cnt(c)`/`sl(c)` are the left-side count/residual-sum of
    * candidate c = (j−1)·7 + (k−1); `tot` is the full residual sum. */
  private def bestStump(seqLen: Int, n: Long, cnt: Array[Long],
                        sl: IndexedSeq[BigInt], tot: BigInt): Stump = {
    var best: Stump = null
    var bestGain = BigInt(-1)
    var c = 0
    while (c < nCand(seqLen)) {
      val j = c / (ThresholdDenom - 1) + 1
      val k = c % (ThresholdDenom - 1) + 1
      val nL = cnt(c); val nR = n - nL
      val (gain, stump) =
        if (nL == 0L || nR == 0L) (BigInt(-1), Stump(j, k, 0L, 0L))
        else {
          val mL = snap(sl(c), nL)
          val mR = snap(tot - sl(c), nR)
          (BigInt(mL) * mL * nL + BigInt(mR) * mR * nR, Stump(j, k, mL, mR))
        }
      // strict > keeps the smallest (j, k) on ties — candidates iterate
      // in (j, k) order
      if (gain > bestGain) { bestGain = gain; best = stump }
      c += 1
    }
    if (bestGain.signum <= 0) Stump(1, 1, 0L, 0L) else best
  }

  /** Distributed fit over a WIN-1 samples frame (`features` array<double>
    * of scaled lags, `labels` array<double> of scaled horizon steps). */
  def fit(samples: DataFrame, seqLen: Int = 10, horizon: Int = 5,
          rounds: Int = 4): BoostModel = {
    val nc = nCand(seqLen)
    val qs = samples.select(col("features"), col("labels")).rdd.map { row =>
      val f = row.getSeq[Double](0)
      val y = row.getSeq[Double](1)
      require(f.length == seqLen && y.length == horizon, "bad sample shape")
      (f.map(quantizeLong).toArray, y.map(quantizeLong).toArray)
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 0: n and Σqy_h → base scores
      val acc0 = qs.treeAggregate(new Acc(horizon))(
        seqOp = (a, s) => {
          var h = 0
          while (h < horizon) { a.part(h) += s._2(h); h += 1 }
          a.rows += 1; a.n += 1
          if (a.n == 1024) a.fold()
          a
        },
        combOp = (a, b) => a.merge(b))
      acc0.fold()
      val n = acc0.rows
      if (n == 0L)
        return new BoostModel(seqLen, horizon, new Array[Long](horizon),
          Array.fill(horizon)(Array.empty[Stump]))
      val base = Array.tabulate(horizon)(h => snap(acc0.big(h), n))
      val stumps = Array.fill(horizon)(Array.newBuilder[Stump])
      var t = 0
      while (t < rounds) {
        val modelSoFar = stumps.map(_.result()) // driver-tiny, serialized into the closure
        // one pass: left counts per candidate (label-free, shared across
        // h) + per-h left residual sums + per-h total residual sums
        val len = nc + horizon * nc + horizon
        val acc = qs.treeAggregate(new Acc(len))(
          seqOp = (a, s) => {
            val (qx, qy) = s
            val rq = Array.tabulate(horizon) { h =>
              var r = qy(h) - base(h)
              var i = 0
              while (i < modelSoFar(h).length) { r -= modelSoFar(h)(i)(qx); i += 1 }
              r
            }
            var c = 0
            while (c < nc) {
              val j = c / (ThresholdDenom - 1)
              val k = c % (ThresholdDenom - 1)
              if (qx(j) <= ThrQ(k)) {
                a.part(c) += 1L
                var h = 0
                while (h < horizon) { a.part(nc + h * nc + c) += rq(h); h += 1 }
              }
              c += 1
            }
            var h = 0
            while (h < horizon) { a.part(nc + horizon * nc + h) += rq(h); h += 1 }
            a.n += 1
            if (a.n == 1024) a.fold()
            a
          },
          combOp = (a, b) => a.merge(b))
        acc.fold()
        val cnt = Array.tabulate(nc)(c => acc.big(c).toLong)
        var h = 0
        while (h < horizon) {
          val sl = (0 until nc).map(c => acc.big(nc + h * nc + c))
          stumps(h) += bestStump(seqLen, n, cnt, sl, acc.big(nc + horizon * nc + h))
          h += 1
        }
        t += 1
      }
      new BoostModel(seqLen, horizon, base, stumps.map(_.result()))
    } finally qs.unpersist()
  }

  /** Sequential local fit — the spec's replay twin of [[fit]] (identical
    * arithmetic, no Spark) and the per-key engine behind
    * `ml1_boost_forecast_per_key` and the streaming loop's boost mode.
    * Same one-pass-per-round accumulation as the distributed seqOp (the
    * naive per-candidate rescan was measured 6× slower across the per-key
    * query's 150 fits); sums accumulate in Long with a BigInt fold every
    * 1024 samples — exact at any history length, like the Acc class. */
  def fitLocal(samples: Seq[(Array[Double], Array[Double])], seqLen: Int,
               horizon: Int, rounds: Int): BoostModel = {
    val nc = nCand(seqLen)
    val qs = samples.map { case (f, y) => (f.map(quantizeLong), y.map(quantizeLong)) }
    val n = qs.size.toLong
    if (n == 0L)
      return new BoostModel(seqLen, horizon, new Array[Long](horizon),
        Array.fill(horizon)(Array.empty[Stump]))
    val base = Array.tabulate(horizon)(h => snap(qs.map(s => BigInt(s._2(h))).sum, n))
    val stumps = Array.fill(horizon)(Array.newBuilder[Stump])
    var t = 0
    while (t < rounds) {
      val model = stumps.map(_.result())
      val len = nc + horizon * nc + horizon
      val acc = new Acc(len)
      qs.foreach { case (qx, qy) =>
        val rq = Array.tabulate(horizon) { h =>
          var r = qy(h) - base(h)
          var i = 0
          while (i < model(h).length) { r -= model(h)(i)(qx); i += 1 }
          r
        }
        var c = 0
        while (c < nc) {
          val j = c / (ThresholdDenom - 1)
          val k = c % (ThresholdDenom - 1)
          if (qx(j) <= ThrQ(k)) {
            acc.part(c) += 1L
            var h = 0
            while (h < horizon) { acc.part(nc + h * nc + c) += rq(h); h += 1 }
          }
          c += 1
        }
        var h = 0
        while (h < horizon) { acc.part(nc + horizon * nc + h) += rq(h); h += 1 }
        acc.n += 1
        if (acc.n == 1024) acc.fold()
      }
      acc.fold()
      val cnt = Array.tabulate(nc)(c => acc.big(c).toLong)
      var h = 0
      while (h < horizon) {
        val sl = (0 until nc).map(c => acc.big(nc + h * nc + c))
        stumps(h) += bestStump(seqLen, n, cnt, sl, acc.big(nc + horizon * nc + h))
        h += 1
      }
      t += 1
    }
    new BoostModel(seqLen, horizon, base, stumps.map(_.result()))
  }

  // ---- generated DuckDB mirror (the ml1_boost_forecast oracle) ----

  /** CASE dispatch from the candidate's lag index to the sample's
    * quantized column. */
  private def qxCase(seqLen: Int, jExpr: String): String =
    s"CASE $jExpr " +
      (1 to seqLen).map(j => s"WHEN $j THEN qx_$j").mkString(" ") + " END"

  /** The per-horizon boosting chain as unrolled CTEs. Expects a CTE
    * `q(qx_1..qx_seqLen, qy_1..qy_horizon)` of quantized samples (plus
    * `user_id` when `perKey`) and emits `f0` plus `s_{h}_{t}` stump CTEs;
    * returns (ctes, stumpSumSql(h)). With `perKey`, every stage carries
    * `user_id` and the per-round argmax is a per-user row_number — ONE
    * fit per user, the reference's per-ticker semantics. */
  def sqlBoostStages(seqLen: Int, horizon: Int, rounds: Int,
                     perKey: Boolean = false): (Seq[String], Int => String) = {
    val uid = if (perKey) "user_id, " else ""
    val thrList = ThrQ.zipWithIndex
      .map { case (thr, i) => s"(${i + 1}, ${thr}::BIGINT)" }.mkString(", ")
    val candCte =
      (1 to seqLen).map(j => s"SELECT $j AS j, k, thr FROM (VALUES $thrList) tk(k, thr)")
        .mkString("\n           UNION ALL ")
    val f0Group = if (perKey) " GROUP BY user_id" else ""
    val f0 = s"f0 AS (SELECT ${uid}count(*) AS n, " +
      (1 to horizon).map(h =>
        s"CAST(floor(CAST(sum(qy_$h) AS DOUBLE)/count(*) + 0.5) AS BIGINT) AS f0_$h")
        .mkString(", ") + s" FROM q$f0Group)"
    // stage-to-stage combination: a plain cross join globally; an
    // equi-join on user_id per key
    def comb(left: String, right: String, leftAlias: String = ""): String =
      if (perKey) s"FROM $left JOIN $right ON $right.user_id = ${if (leftAlias.nonEmpty) leftAlias else left}.user_id"
      else s"FROM $left, $right"
    val qxCols = (1 to seqLen).map(j => s"qx_$j").mkString(", ")
    val chains = for (h <- 1 to horizon; t <- 1 to rounds) yield {
      val prev =
        if (t == 1)
          s"r_${h}_1 AS (SELECT ${if (perKey) "q.user_id, " else ""}$qxCols, " +
            s"qy_$h - f0_$h AS rq ${comb("q", "f0")})"
        else {
          val s = s"s_${h}_${t - 1}"
          s"r_${h}_$t AS (SELECT ${if (perKey) s"r_${h}_${t - 1}.user_id, " else ""}$qxCols, " +
            s"rq - (CASE WHEN ${qxCase(seqLen, s"$s.j")} <= $s.thr THEN $s.leafl ELSE $s.leafr END) AS rq " +
            s"${comb(s"r_${h}_${t - 1}", s)})"
        }
      val cand =
        s"""c_${h}_$t AS (
           SELECT ${uid}j, k, thr,
             CASE WHEN nl = 0 OR nn - nl = 0 THEN 0 ELSE
               CAST(floor(CAST(sl AS DOUBLE)/nl + 0.5) AS BIGINT) END AS leafl,
             CASE WHEN nl = 0 OR nn - nl = 0 THEN 0 ELSE
               CAST(floor(CAST(st - sl AS DOUBLE)/(nn - nl) + 0.5) AS BIGINT) END AS leafr,
             (CASE WHEN nl = 0 OR nn - nl = 0 THEN (-1)::HUGEINT ELSE
               CAST(floor(CAST(sl AS DOUBLE)/nl + 0.5) AS HUGEINT)
                 * CAST(floor(CAST(sl AS DOUBLE)/nl + 0.5) AS BIGINT) * nl
               + CAST(floor(CAST(st - sl AS DOUBLE)/(nn - nl) + 0.5) AS HUGEINT)
                 * CAST(floor(CAST(st - sl AS DOUBLE)/(nn - nl) + 0.5) AS BIGINT) * (nn - nl)
              END) AS gain
           FROM (SELECT ${uid}j, k, thr,
                   count(*) FILTER (WHERE qx <= thr) AS nl,
                   COALESCE(sum(rq) FILTER (WHERE qx <= thr), 0)::HUGEINT AS sl,
                   count(*) AS nn, sum(rq)::HUGEINT AS st
                 FROM (SELECT ${if (perKey) s"r_${h}_$t.user_id, " else ""}c.j, c.k, c.thr, ${qxCase(seqLen, "c.j")} AS qx, rq
                       FROM r_${h}_$t, ($candCte) c)
                 GROUP BY ${uid}j, k, thr))"""
      val best =
        if (perKey)
          s"""b_${h}_$t AS (
             SELECT user_id, j, k, thr, leafl, leafr, gain FROM (
               SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY (CASE WHEN gain <= 0 THEN 1 ELSE 0 END), gain DESC, j, k) AS rk
               FROM c_${h}_$t) WHERE rk = 1)"""
        else
          s"""b_${h}_$t AS (
             SELECT j, k, thr, leafl, leafr, gain
             FROM c_${h}_$t
             ORDER BY (CASE WHEN gain <= 0 THEN 1 ELSE 0 END), gain DESC, j, k LIMIT 1)"""
      // a degenerate round (best gain <= 0) must be the (1,1) no-op stump,
      // matching bestStump's fallback
      val bestFixed =
        s"""s_${h}_$t AS (
           SELECT ${uid}CASE WHEN gain <= 0 THEN 1 ELSE j END AS j,
                  CASE WHEN gain <= 0 THEN ${ThrQ(0)}::BIGINT ELSE thr END AS thr,
                  CASE WHEN gain <= 0 THEN 0 ELSE leafl END AS leafl,
                  CASE WHEN gain <= 0 THEN 0 ELSE leafr END AS leafr
           FROM b_${h}_$t)"""
      Seq(prev, cand, best, bestFixed)
    }
    val stumpSum = (h: Int) =>
      (1 to rounds).map { t =>
        s"(CASE WHEN ${qxCase(seqLen, s"s_${h}_$t.j")} <= s_${h}_$t.thr " +
          s"THEN s_${h}_$t.leafl ELSE s_${h}_$t.leafr END)"
      }.mkString(" + ")
    (f0 +: chains.flatten, stumpSum)
  }
}
