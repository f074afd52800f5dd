package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model.{StableBoost, StableRidge}

/** Quality-classifier distillation — the FineWeb-Edu recipe as a
  * first-class operator: an EXPENSIVE teacher labels a corpus slice and
  * a CHEAP feature-based student is trained to reproduce it, because at
  * 100 TB you cannot afford the teacher per document (there it is an
  * LLM labeler; here the stand-in teacher is the rule-based C4 gate
  * [[TextAnalysis.c4Filter]], whose regex battery is already the most
  * expensive scan in the gate family — the machinery is the point, the
  * teacher is swappable).
  *
  * Student: [[graft.model.StableBoost]] boosted stumps over 5 cheap
  * numeric features, each a deterministic integer-ratio projection of
  * the text mapped into [0,1]:
  *   f1 capped length, f2 punctuation density, f3 stopword ratio,
  *   f4 capped mean word length, f5 type-token ratio (repetition).
  * The label is the teacher's keep bit. The whole fit lives on the
  * 2^-26 grid (quantized features, integer residuals, grid-snapped
  * leaves), so the trained model — and therefore every per-doc score —
  * is a deterministic function of the corpus SET under any
  * partitioning/AQE/engine, which is what makes `txt_quality_distill` a
  * full hash oracle (the generated [[StableBoost.sqlBoostStages]]
  * mirror replays the fit round-for-round in DuckDB).
  *
  * Scale shape: feature extraction is scan-speed projections; the fit
  * is `rounds` map-side-combined passes each emitting a (5·7 counts +
  * 5·7 + 1 sums)-long exact summary (the MLlib GBT iteration); the
  * model is driver-tiny and scores the corpus as plan literals — one
  * integer compare per stump, whole-stage codegen'd, zero shuffle. The
  * output keeps the teacher bit beside the student's, so
  * student/teacher agreement is one aggregation away — the
  * distillation-quality metric a curation run monitors. */
object Distill {

  val Feats = 8
  val Rounds = 8
  /** keep ⇔ score ≥ 0.5 on the 2^-26 grid — an integer compare. */
  val KeepThresholdQ: Long = StableRidge.Q / 2

  /** Per-doc integer signals + the teacher bit + the eight [0,1]
    * features. Every feature is (capped) integer ratios through IEEE
    * double division only — bit-identical in any engine — and each is
    * SCALED SO THE TEACHER'S DECISION BOUNDARY LANDS ON A STUMP GRID
    * POINT (thresholds live at k/8, k∈1..7): a student can only learn
    * a boundary its hypothesis class can express, so the feature map is
    * where the distillation quality is won:
    *  - f1 = min(n_tokens,159)/159 — the too-short cut (<20) falls
    *    BETWEEN 19/159 and 20/159 around 1/8: an exact stump;
    *  - f2 = min(n_tokens,1024)/1024 — the too-long cut near 7/8;
    *  - f3 = min(punct_ratio·1.25, 1) — the 10% punct cut AT 1/8;
    *  - f4 = min(stop_ratio·2.5, 1) — the 5% stopword cut AT 1/8;
    *  - f5..f7 = clamp(c_X − c_en + 4, 0, 8)/8 for X ∈ {de, es, fr} —
    *    the language-argmax margins: "X beats en" is ≥ 5/8 vs ≤ 4/8,
    *    an exact stump at k=4 (integer margins, so no boundary mass);
    *  - f8 = type-token ratio (distinct/total) — a generic repetition
    *    signal with no aligned teacher boundary, kept to show the fit
    *    does not need it (the teacher never looks at it). */
  private def featureFrame(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val marker: String => Column = re =>
      regexp_count(col("text"), lit(re)).cast("long")
    val raw = docs.select(col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars"),
      regexp_count(col("text"), lit("[.!?,;:]")).cast("long").as("n_punct"),
      regexp_count(col("text"), lit("\\b(the|a|of|and|to|in|is)\\b"))
        .cast("long").as("n_stop"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      marker("\\b(the|order|fast|scan)\\b").as("c_en"),
      marker("\\b(stream|merge|window)\\b").as("c_de"),
      marker("\\b(table|query|group)\\b").as("c_es"),
      marker("\\b(join|filter|sort)\\b").as("c_fr"))
    val margin: Column => Column = cx =>
      least(greatest(cx - col("c_en") + lit(4L), lit(0L)), lit(8L)) / lit(8.0)
    // teacher bit inlined from the same integer signals (identical to
    // TextAnalysis.c4Filter's keep — DistillSpec pins the equivalence
    // against the real gate) so the frame stays ONE projection: no join,
    // and therefore streaming-safe for the frozen-student serving path
    val enWins = col("c_en") >= col("c_de") && col("c_en") >= col("c_es") &&
      col("c_en") >= col("c_fr")
    val teacher = !(col("n_tokens") < 20L || col("n_tokens") > 1000L ||
      col("n_punct") * 10L > col("n_chars") ||
      col("n_stop") * 20L < col("n_tokens") || !enWins)
    raw
      .select(col("doc_id"), teacher.as("teacher_keep"),
        (least(col("n_tokens"), lit(159L)) / lit(159.0)).as("f1"),
        (least(col("n_tokens"), lit(1024L)) / lit(1024.0)).as("f2"),
        least(col("n_punct") / col("n_chars") * lit(1.25), lit(1.0)).as("f3"),
        least(col("n_stop") / col("n_tokens") * lit(2.5), lit(1.0)).as("f4"),
        margin(col("c_de")).as("f5"),
        margin(col("c_es")).as("f6"),
        margin(col("c_fr")).as("f7"),
        (col("n_distinct") / col("n_tokens")).as("f8"))
  }

  /** Train the student on the teacher's labels, then score every doc with
    * the model as plan literals. Output: (doc_id, teacher_keep, score_q,
    * student_keep) — score_q is the student's grid-units score (an exact
    * integer), student_keep its ≥0.5 decision. */
  def distillGate(docs: DataFrame, rounds: Int = Rounds): DataFrame =
    scoreWith(docs, fit(docs, rounds)).orderBy("doc_id")

  /** Train the student on the teacher's labels over `docs`. The model is
    * driver-tiny (1 base score + `rounds` stumps) — the artifact a
    * curation run ships to its ingest tier. */
  def fit(docs: DataFrame, rounds: Int = Rounds): graft.model.StableBoost.BoostModel = {
    val feats = featureFrame(docs)
    val samples = feats.select(
      array((1 to Feats).map(i => col(s"f$i")): _*).as("features"),
      array(col("teacher_keep").cast("double")).as("labels"))
    StableBoost.fit(samples, seqLen = Feats, horizon = 1, rounds = rounds)
  }

  /** Score a corpus with a FROZEN student — the serving/ingest form
    * (the [[Bpe.encodeWith]] discipline): the model applies as plan
    * literals over the scan-speed feature projections, stateless, so
    * the identical chain runs per micro-batch on a streaming frame with
    * bit-identical scores (`StreamingDistillSpec`). The teacher column
    * rides along for agreement monitoring. */
  def scoreWith(docs: DataFrame, model: graft.model.StableBoost.BoostModel): DataFrame = {
    val feats = featureFrame(docs)
    val qx: Int => Column = j =>
      floor(col(s"f$j") * StableRidge.Q + lit(0.5)).cast("long")
    val scoreQ = model.stumps(0).foldLeft(lit(model.base(0)): Column) { (acc, st) =>
      acc + when(qx(st.j) <= st.thrQ, lit(st.leafL)).otherwise(lit(st.leafR))
    }
    feats.select(col("doc_id"), col("teacher_keep"),
      scoreQ.as("score_q"),
      (scoreQ >= lit(KeepThresholdQ)).as("student_keep"))
  }

  def distillGateQuery(spark: SparkSession, dir: String): DataFrame =
    distillGate(Tables.documents(spark, dir))
}
