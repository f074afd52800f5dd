package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Distill]] — gate distillation. The hash oracle pins the arithmetic;
  * what it cannot localize is pinned here: the fit is a deterministic
  * function of the corpus SET (partitioning-invariant), the teacher
  * column is exactly the C4 gate, and the student actually LEARNS the
  * teacher (an agreement floor — the distillation-quality bar; the
  * boundary-aligned feature map is what earns it, measured 0.92 on the
  * sf0.01 corpus at the oracled configuration). */
class DistillSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sfDir)

  test("distillation is bit-stable under repartitioning") {
    val a = Distill.distillGate(docs).collect().toSeq
    val b = Distill.distillGate(docs.repartition(7)).collect().toSeq
    assert(a == b, "fit/score must be a function of the corpus set, not its layout")
    assert(a.nonEmpty)
  }

  test("teacher column is exactly the C4 gate; student clears the agreement floor") {
    val out = Distill.distillGate(docs)
    val gate = TextAnalysis.c4Filter(docs).select(col("doc_id"), col("keep"))
    val mismatch = out.join(gate, "doc_id")
      .where(col("teacher_keep") =!= col("keep")).count()
    assert(mismatch === 0L, "teacher_keep must replicate the gate bit-for-bit")
    val (n, agree, keeps) = out.select(
        count(lit(1)), sum(when(col("teacher_keep") === col("student_keep"), 1L).otherwise(0L)),
        sum(when(col("student_keep"), 1L).otherwise(0L)))
      .as[(Long, Long, Long)].head()
    val rate = agree.toDouble / n
    info(f"agreement $rate%.4f  student keeps $keeps/$n")
    assert(rate >= 0.80, f"student/teacher agreement $rate%.4f under the 0.80 floor")
    assert(keeps > 0L && keeps < n, "student must not be degenerate (all-keep / all-drop)")
  }

  test("the language-margin features give the stump grid an exact boundary") {
    // two docs identical except the marker balance: `de` markers beating
    // `en` flips the teacher; f5 crosses the k=4 gridpoint exactly
    val en = ("the order fast scan the a of and to in is " * 4).trim
    val de = ("stream merge window stream a of and to in is " * 4).trim
    val f = Distill.distillGate(Seq.tabulate(40)(i =>
      (i.toLong, if (i % 2 == 0) en else de)).toDF("doc_id", "text"))
      .select("doc_id", "teacher_keep", "student_keep")
      .as[(Long, Boolean, Boolean)].collect()
    assert(f.forall { case (id, t, s) => t == (id % 2 == 0) && s == t },
      "a marker-margin-separable corpus must distill perfectly")
  }
}
