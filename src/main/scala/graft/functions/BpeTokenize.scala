package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy BPE segment encoder with an O(1)-in-vocab-size per-step cost —
  * the JVM core behind the `bpe_tokenize` native expression.
  *
  * Semantics contract: the output is BIT-IDENTICAL to applying the merge
  * table in rank order, each merge as one left-to-right non-overlapping
  * replace over the symbol sequence (the [[graft.analytics.Bpe]] chain
  * semantics, i.e. `replace(seq, ␁l␂␁r␂, ␁lr␂)` per round — and the
  * DuckDB oracle's recursive replace chain). Equivalence holds because a
  * merged pair can never re-form (symbols only ever concatenate, and a
  * fuse never brings two previously non-adjacent symbols together), so
  * "apply rank k exhaustively, then rank k+1" equals "always apply the
  * lowest-ranked pair present, leftmost first" — which is what the heap
  * walk below does. [[graft.analytics.BpeDeepSpec]] pins the equality on
  * the real corpus and on adversarial self-pair/cascade words.
  *
  * Cost: O(L log L) per segment (L = codepoint count) with a constant
  * rank lookup per adjacency — INDEPENDENT of the merge-table depth.
  * The 12-round fold chain in [[graft.analytics.Bpe.encodeWith]] is one
  * string replace per merge per row: fine at 12 merges, quadratic death
  * at a real 32k-merge vocabulary. This coder is the 100 TB tokenize
  * path: one scan, zero shuffle, merge table rides as model parameters.
  *
  * Symbols are tracked per CODEPOINT (matching DuckDB's `(.)` regexp and
  * `len()`), not per UTF-16 code unit.
  */
final class BpeCoder(val merges: Seq[(String, String)]) extends Serializable {

  /** rank by wrapped pair key; a pair can appear at most once in a valid
    * BPE merge table (a merged pair never re-forms), enforced at build. */
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      val prev = m.put(l + "\u0000" + r, Integer.valueOf(i))
      require(prev == null, s"duplicate merge pair ($l,$r) at ranks $prev/$i")
    }
    m
  }

  private def rankOf(l: String, r: String): Integer = ranks.get(l + "\u0000" + r)

  /** Encode one segment (must contain no space — callers pre-substitute
    * the SentencePiece `▁` meta-symbol) to its space-joined BPE tokens. */
  def encode(seg: UTF8String): UTF8String =
    UTF8String.fromString(encodeString(seg.toString))

  def encodeString(seg: String): String = {
    if (seg.isEmpty) return ""
    // codepoint symbol array + doubly-linked alive list
    val cps = seg.codePoints().toArray
    val n = cps.length
    val syms = new Array[String](n)
    var i = 0
    while (i < n) { syms(i) = new String(Character.toChars(cps(i))); i += 1 }
    if (n > 1 && !merges.isEmpty) {
      val nxt = new Array[Int](n)
      val prv = new Array[Int](n)
      val alive = new Array[Boolean](n)
      i = 0
      while (i < n) { nxt(i) = i + 1; prv(i) = i - 1; alive(i) = true; i += 1 }
      // binary min-heap of (rank, pos) packed into a long: rank<<32 | pos.
      // Ordering (rank, then pos) = lowest-ranked merge first, leftmost
      // occurrence first — positions are stable (fuses delete, never move),
      // so "leftmost alive index" is exactly the left-to-right scan order.
      var heap = new Array[Long](math.min(n, 16))
      var hn = 0
      def push(v: Long): Unit = {
        if (hn == heap.length) heap = java.util.Arrays.copyOf(heap, heap.length * 2)
        var c = hn; heap(c) = v; hn += 1
        while (c > 0 && heap((c - 1) / 2) > heap(c)) {
          val p = (c - 1) / 2; val t = heap(p); heap(p) = heap(c); heap(c) = t; c = p
        }
      }
      def pop(): Long = {
        val top = heap(0); hn -= 1; heap(0) = heap(hn)
        var c = 0
        var go = true
        while (go) {
          val l = 2 * c + 1; val r = l + 1
          var s = c
          if (l < hn && heap(l) < heap(s)) s = l
          if (r < hn && heap(r) < heap(s)) s = r
          if (s == c) go = false
          else { val t = heap(s); heap(s) = heap(c); heap(c) = t; c = s }
        }
        top
      }
      def offer(pos: Int, next: Int): Unit = {
        val rk = rankOf(syms(pos), syms(next))
        if (rk != null) push((rk.longValue() << 32) | pos.toLong)
      }
      i = 0
      while (i < n - 1) { offer(i, i + 1); i += 1 }
      while (hn > 0) {
        val v = pop()
        val rk = (v >>> 32).toInt
        val p = (v & 0xFFFFFFFFL).toInt
        if (alive(p)) {
          val q = nxt(p)
          if (q < n && alive(q)) {
            val cur = rankOf(syms(p), syms(q))
            // stale unless the pair at p still carries this exact rank
            // (rank is unique per pair, so equal rank == equal pair)
            if (cur != null && cur.intValue() == rk) {
              syms(p) = syms(p) + syms(q)
              alive(q) = false
              nxt(p) = nxt(q)
              if (nxt(p) < n) prv(nxt(p)) = p
              if (prv(p) >= 0 && alive(prv(p))) offer(prv(p), p)
              if (nxt(p) < n && alive(nxt(p))) offer(p, nxt(p))
            }
          }
        }
      }
      val sb = new java.lang.StringBuilder(seg.length + 16)
      i = 0
      var first = true
      while (i < n) {
        if (alive(i)) {
          if (!first) sb.append(' ')
          sb.append(syms(i)); first = false
        }
        i += 1
      }
      sb.toString
    } else syms.mkString(" ")
  }
}

object BpeCoder {
  /** Separators for the merges literal (`bpe_tokenize` argument 2). The
    * symbols themselves come from corpus codepoints + `▁`, which the
    * corpus guard keeps free of these controls. */
  val PairSep = "\u001e"
  val SymSep = "\u001f"

  def literal(merges: Seq[(String, String)]): String = {
    merges.foreach { case (l, r) =>
      require(!l.contains(PairSep) && !l.contains(SymSep) &&
              !r.contains(PairSep) && !r.contains(SymSep),
        s"merge symbols must not contain the literal separators: ($l,$r)")
    }
    merges.map { case (l, r) => l + SymSep + r }.mkString(PairSep)
  }

  def parse(s: String): Seq[(String, String)] =
    if (s.isEmpty) Seq.empty
    else s.split(PairSep, -1).toSeq.map { p =>
      val i = p.indexOf(SymSep)
      require(i >= 0, s"malformed merges literal entry: '$p'")
      (p.substring(0, i), p.substring(i + 1))
    }
}

/** Native Catalyst expression `bpe_tokenize(seg, mergesLiteral)`: BPE
  * tokenization of a pre-segmented string (space-joined token output).
  *
  * The merge table is parsed ONCE at construction from the foldable
  * second argument and carried as expression METADATA, not as a child:
  * the plan tree holds one node whatever the vocabulary depth (the
  * "constant plan size" law — the fold-chain alternative adds one
  * Project per merge and dies at real vocab sizes; `BpeDeepSpec` pins
  * the plan-size comparison). Codegen emits a single virtual call into
  * [[BpeCoder]], so the tokenize pass stays inside whole-stage codegen.
  */
case class BpeTokenize(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_tokenize"
  // keep the merge table out of every plan rendering — show its depth
  override def stringArgs: Iterator[Any] = Iterator(child, s"merges=${merges.size}")

  @transient private lazy val coder = new BpeCoder(merges)

  override def nullSafeEval(s: Any): Any = coder.encode(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCoder", coder, classOf[BpeCoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
