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

  /** Interned symbol tables (built once per coder, lazily — the
    * duplicate-pair guard throws here, on first encode): every distinct
    * symbol STRING in the merge table (lhs, rhs, merged) gets an integer
    * id, pair ranks key on the packed `(lid << 32) | rid` long in a
    * SORTED array probed by binary search, and each rank knows its
    * merged symbol's id. The encode walk below then never touches a
    * string: the previous string-keyed form concatenated + hashed the
    * two symbol strings PER RANK PROBE — a cost that grows with symbol
    * length exactly when the vocabulary is representative (long merged
    * symbols that keep matching), measured as the dominant tokenize
    * cost after the r13 sample fix. */
  @transient private lazy val table: BpeCoder.Table = BpeCoder.buildTable(merges)

  /** Encode one segment (must contain no space — callers pre-substitute
    * the SentencePiece `▁` meta-symbol) to its space-joined BPE tokens. */
  def encode(seg: UTF8String): UTF8String =
    UTF8String.fromString(encodeString(seg.toString))

  def encodeString(seg: String): String = {
    if (seg.isEmpty) return ""
    // codepoint array; each position carries its symbol as an interned ID
    // (for rank probes) plus its codepoint RANGE end (for output): a fuse
    // concatenates ADJACENT ranges, so every live symbol is a substring
    // of the original segment and no symbol string is ever built here
    val cps = seg.codePoints().toArray
    val n = cps.length
    if (n > 1 && !merges.isEmpty) {
      val t = table
      val ids = new Array[Int](n)
      val symEnd = new Array[Int](n)
      val nxt = new Array[Int](n)
      val prv = new Array[Int](n)
      val alive = new Array[Boolean](n)
      var i = 0
      while (i < n) {
        ids(i) = t.cpIdOf(cps(i)) // -1: participates in no merge
        symEnd(i) = i + 1
        nxt(i) = i + 1; prv(i) = i - 1; alive(i) = true
        i += 1
      }
      def rankOf(p: Int, q: Int): Int = {
        val a = ids(p); val b = ids(q)
        if (a < 0 || b < 0) -1
        else {
          val ix = java.util.Arrays.binarySearch(
            t.pairKeys, (a.toLong << 32) | b.toLong)
          if (ix >= 0) t.pairRank(ix) else -1
        }
      }
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
        val rk = rankOf(pos, next)
        if (rk >= 0) push((rk.toLong << 32) | pos.toLong)
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
            // stale unless the pair at p still carries this exact rank
            // (rank is unique per pair, so equal rank == equal pair)
            if (rankOf(p, q) == rk) {
              ids(p) = t.mergedIdByRank(rk)
              symEnd(p) = symEnd(q)
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
          var j = i
          while (j < symEnd(i)) { sb.appendCodePoint(cps(j)); j += 1 }
          first = false
        }
        i += 1
      }
      sb.toString
    } else {
      // single codepoint or empty merge table: tokens = the codepoints;
      // still force table construction so an invalid merge table
      // (duplicate pair) is rejected deterministically on any input
      if (merges.nonEmpty) { val _ = table }
      val sb = new java.lang.StringBuilder(seg.length * 2)
      var i = 0
      while (i < n) {
        if (i > 0) sb.append(' ')
        sb.appendCodePoint(cps(i))
        i += 1
      }
      sb.toString
    }
  }
}

object BpeCoder {

  /** The interned form of a merge table: `pairKeys` sorted packed
    * `(lhsId << 32) | rhsId` longs with `pairRank` aligned (rank of the
    * key at the same index), `mergedIdByRank` the id of rank r's fused
    * symbol, and the single-codepoint id table (`cpKeys` sorted,
    * `cpIds` aligned) for seeding a segment. Symbol ids are assigned by
    * STRING identity over every lhs/rhs/merged in table order, so two
    * merges producing the same string share one id — exactly the
    * string-equality semantics the replace-chain contract defines. */
  final class Table(val pairKeys: Array[Long], val pairRank: Array[Int],
                    val mergedIdByRank: Array[Int],
                    val cpKeys: Array[Int], val cpIds: Array[Int]) extends Serializable {
    def cpIdOf(cp: Int): Int = {
      val ix = java.util.Arrays.binarySearch(cpKeys, cp)
      if (ix >= 0) cpIds(ix) else -1
    }
  }

  private[functions] def buildTable(merges: Seq[(String, String)]): Table = {
    val symId = new java.util.HashMap[String, Integer]()
    def idOf(s: String): Int = {
      var v = symId.get(s)
      if (v == null) { v = Integer.valueOf(symId.size); symId.put(s, v) }
      v.intValue()
    }
    val m = merges.size
    val keys = new Array[Long](m)
    val mergedIds = new Array[Int](m)
    val seen = new java.util.HashMap[java.lang.Long, Integer]()
    var i = 0
    merges.foreach { case (l, r) =>
      val k = (idOf(l).toLong << 32) | idOf(r).toLong
      val prev = seen.put(java.lang.Long.valueOf(k), Integer.valueOf(i))
      require(prev == null, s"duplicate merge pair ($l,$r) at ranks $prev/$i")
      keys(i) = k
      mergedIds(i) = idOf(l + r)
      i += 1
    }
    // co-sort (key, rank) by key for the binary-searched probe
    val order = (0 until m).sortBy(keys(_)).toArray
    val sortedKeys = new Array[Long](m)
    val rankAt = new Array[Int](m)
    i = 0
    while (i < m) { sortedKeys(i) = keys(order(i)); rankAt(i) = order(i); i += 1 }
    // single-codepoint symbols seed segment positions
    val cpPairs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    symId.forEach { (s, id) =>
      if (s.codePointCount(0, s.length) == 1) cpPairs += ((s.codePointAt(0), id.intValue()))
    }
    val cpSorted = cpPairs.sortBy(_._1).toArray
    new Table(sortedKeys, rankAt, mergedIds,
      cpSorted.map(_._1), cpSorted.map(_._2))
  }

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
