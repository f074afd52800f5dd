package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two `array<double>`
  * columns, with whole-stage codegen (`doGenCode`).
  *
  * Why a custom expression (SURVEY §7.3 ladder, step (b)): the composed
  * form — `aggregate(zip_with(a,b,*), ..)` over three lambda passes —
  * allocates two intermediate arrays per row and evaluates higher-order
  * lambdas; for the all-pairs near-dup join that is millions of rows. The
  * native loop is a single pass, zero allocations, and fuses into the
  * surrounding whole-stage-codegen'd join/filter stage.
  *
  * Summation order (dot, then each norm, left-to-right) is IDENTICAL to
  * the composed fold, so results are bit-equal and the DuckDB oracle
  * parity (`list_cosine_similarity` after `::DOUBLE[]`, rounded to 4)
  * is unchanged. Mismatched lengths yield NULL.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // Seq[DataType] <: Seq[AbstractDataType]: avoids naming AbstractDataType,
  // which is private[sql] in Spark 4
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = $a.getDouble($i);
         |    final double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session extensions registering the engine's native functions
  * (`spark.sql.extensions` / `Builder.withExtensions` — wired in
  * [[graft.Sessions.local]]). SQL + DataFrame callers use
  * `cosine_sim(a, b)` via the function registry. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator custom plan: the native as-of merge join
    // (graft.plans.AsOfJoinNode -> AsOfMergeJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getCanonicalName, "hyperplane_sig"),
      (children: Seq[Expression]) => {
        def intArg(i: Int): Int = children(i) match {
          case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
          case e => throw new IllegalArgumentException(
            s"hyperplane_sig argument ${i + 1} must be a literal int, got $e")
        }
        HyperplaneSig(children(0), intArg(1), intArg(2), intArg(3))
      }))
    ext.injectFunction((
      new FunctionIdentifier("zvalue"),
      new ExpressionInfo(classOf[ZValue].getCanonicalName, "zvalue"),
      (children: Seq[Expression]) => ZValue(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("hilbert"),
      new ExpressionInfo(classOf[HilbertValue].getCanonicalName, "hilbert"),
      (children: Seq[Expression]) => HilbertValue(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CmsSketch].getCanonicalName, "cms_sketch"),
      (children: Seq[Expression]) => {
        def intArg(i: Int): Int = children(i) match {
          case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
          case e => throw new IllegalArgumentException(
            s"cms_sketch argument ${i + 1} must be a literal int, got $e")
        }
        CmsSketch(children(0), intArg(1), intArg(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketch].getCanonicalName, "kmv_sketch"),
      (children: Seq[Expression]) => {
        val kArg = children(1) match {
          case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
          case e => throw new IllegalArgumentException(
            s"kmv_sketch argument 2 must be a literal int, got $e")
        }
        KmvSketch(children(0), kArg)
      }))
    // BPE tokenization against a frozen merge table: argument 2 is the
    // BpeCoder-encoded merges literal, parsed ONCE here so the plan node
    // carries the table as metadata, not as a child (constant plan size
    // whatever the vocab depth)
    ext.injectFunction((
      new FunctionIdentifier("bpe_tokenize"),
      new ExpressionInfo(classOf[BpeTokenize].getCanonicalName, "bpe_tokenize"),
      (children: Seq[Expression]) => {
        val mergesLit = children(1) match {
          case e if e.foldable =>
            val v = e.eval()
            if (v == null) "" else v.toString
          case e => throw new IllegalArgumentException(
            s"bpe_tokenize argument 2 must be a literal merges string, got $e")
        }
        BpeTokenize(children(0), BpeCoder.parse(mergesLit))
      }))
    // Spark's own runtime-filter predicate (codegen'd), surfaced for the
    // explicit bloom-prune path (graft.operators.BloomPrune): argument 1
    // is the serialized sketch BloomFilter, argument 2 the long key
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getCanonicalName,
        "bloom_might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(children(0), children(1))))
  }
}
