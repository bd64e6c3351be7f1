package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo, GenericInternalRow, Literal, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Gmf

/** Primitive-signature GMF evaluator referenced from generated code —
  * avoids Function3 boxing so the call JIT-inlines inside the codegen'd
  * projection loop.
  */
abstract class ScalarGmf extends Serializable {
  def eval(inc: Double, wspd: Double, phi: Double): Double
}

/** Native Catalyst expression for a GMF: participates in whole-stage
  * codegen via doGenCode (SURVEY.md §7.3 "stretch: Catalyst Expression
  * w/ codegen" — the numba-`@vectorize` analogue, gmfs.py:209-214).
  */
case class GmfExpression(fn: ScalarGmf, fnName: String,
    first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = fnName
  // pure function of its inputs → all-literal calls constant-fold in the
  // optimizer (the reference precomputes such constants at LUT-build time;
  // here Catalyst's ConstantFolding does it for free once we declare purity)
  override def foldable: Boolean = children.forall(_.foldable)

  override protected def nullSafeEval(i: Any, w: Any, p: Any): Any =
    fn.eval(i.asInstanceOf[Double], w.asInstanceOf[Double], p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gmfFn", fn, classOf[ScalarGmf].getName)
    defineCodeGen(ctx, ev, (i, w, p) => s"$ref.eval($i, $w, $p)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Codegen'd left-to-right dot product over `array<float|double>` columns —
  * the ANN hot-path primitive. The Catalyst higher-order fold
  * (`aggregate(zip_with(...))`) evaluates lambda per element through the
  * interpreter; this compiles to a tight primitive loop inside whole-stage
  * codegen, accumulating in double in index order — bit-identical to the
  * fold and to the DuckDB oracle's `list_reduce`.
  *
  * Length-mismatched arrays yield NULL, matching the fold (zip_with pads
  * the shorter side with nulls, which poison the sum). Precondition: array
  * ELEMENTS are non-null (embedding vectors are dense); top-level null
  * arrays propagate null via nullIntolerant.
  */
case class DotProductExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable even over non-null children: length mismatch yields NULL, so
  // codegen must keep a real isNull slot (not the FalseLiteral shortcut)
  override def nullable: Boolean = true
  override def prettyName: String = "dot_f32"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"dot_f32 expects two array<float|double> args, got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = isFloat(left); val rf = isFloat(right)
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val gl = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val gr = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $acc += $gl * $gr; }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** JIT-friendly kernel for [[RpBucketExpression]]: one virtual call per row,
  * tight primitive loops inside. Plane components and summation order are
  * bit-identical to the Catalyst fold it replaces
  * (Similarity.planeComponent / rpBucket) and to the DuckDB oracle.
  */
object RpBucket extends Serializable {
  def bucket(v: ArrayData, isFloat: Boolean, planes: Int, offset: Int): Long = {
    val n = v.numElements()
    var b = 0L
    var j = 0
    while (j < planes) {
      val cj = (40503L * (offset + j + 1)) % 1000003L
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val m = ((i + 1) * 2654435761L % 1000003L) * cj % 1000003L
        val r = (m * m) % 1000003L % 1000L - 500L
        acc += x * (r.toDouble / 1000.0)
        i += 1
      }
      if (acc > 0) b |= 1L << j
      j += 1
    }
    b
  }
}

/** Codegen'd sign-bit LSH bucket id over `planes` deterministic
  * pseudo-random hyperplanes — the bucket-assignment hot path. The
  * higher-order spelling (`aggregate(zip_with(transform(sequence...)))` per
  * plane) interprets 4 lambdas per element PER PLANE; with auto-scaled
  * plane counts (log2 n) that cost grows with the corpus, so the whole
  * bucket computes here in one compiled pass.
  *
  * `offset` shifts the global plane index: band B of a banded LSH scheme
  * uses planes `offset..offset+planes-1` (bit k of the result is plane
  * `offset+k`), giving every band an independent hyperplane family while
  * both engines can index the family statically.
  */
case class RpBucketExpression(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rp_bucket"

  private def isFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
          org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.IntegerType) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("rp_bucket planes/offset must be literals")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"rp_bucket expects (array<float|double>, int, int), got $other")
    }

  override protected def nullSafeEval(v: Any, p: Any, o: Any): Any =
    RpBucket.bucket(v.asInstanceOf[ArrayData], isFloat, p.asInstanceOf[Int], o.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rpBucket", RpBucket, RpBucket.getClass.getName)
    defineCodeGen(ctx, ev, (v, p, o) => s"$ref.bucket($v, $isFloat, $p, $o)")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** JIT-friendly kernel for [[L2SubExpression]]: squared L2 between one
  * SUBSPACE of a full vector and a subspace codeword, left-to-right,
  * elements widened to double before the subtraction — bit-identical to
  * the Catalyst fold spelling (Similarity.l2sqSubFold) and the DuckDB
  * oracle. The subspace length is the codeword's length.
  */
object L2Sub extends Serializable {
  def d2(a: ArrayData, aFloat: Boolean, w: ArrayData, wFloat: Boolean, sub: Int): Double = {
    val n = w.numElements()
    val off = sub * n
    var acc = 0.0
    var i = 0
    while (i < n) {
      val av = if (aFloat) a.getFloat(off + i).toDouble else a.getDouble(off + i)
      val wv = if (wFloat) w.getFloat(i).toDouble else w.getDouble(i)
      val d = av - wv
      acc += d * d
      i += 1
    }
    acc
  }
}

/** Codegen'd per-subspace squared L2 — the PQ encode/LUT hot path: at
  * corpus scale every vector evaluates m·codebookSize of these, and the
  * higher-order fold spelling pays 4 interpreted lambdas per element.
  * Out-of-range subspaces (sub·|w|+|w| > |a|) yield NULL.
  */
case class L2SubExpression(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "l2sub_f32"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _),
          org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"l2sub_f32 expects (array<float|double>, array<float|double>, int), got $other")
    }

  override protected def nullSafeEval(a: Any, w: Any, s: Any): Any = {
    val av = a.asInstanceOf[ArrayData]; val wv = w.asInstanceOf[ArrayData]
    val sub = s.asInstanceOf[Int]
    if (sub < 0 || (sub + 1) * wv.numElements() > av.numElements()) null
    else L2Sub.d2(av, isFloat(first), wv, isFloat(second), sub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("l2sub", L2Sub, L2Sub.getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, w, s) => {
      s"""
         |if ($s < 0 || ($s + 1) * $w.numElements() > $a.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $ref.d2($a, ${isFloat(first)}, $w, ${isFloat(second)}, $s);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Kernel for [[PolyHashExpression]]: the polynomial rolling hash
  * `h = (h·31 + codepoint) mod P` over a string's characters, left to
  * right — bit-identical to the Catalyst `aggregate(sequence(...))` fold
  * spelling (TextOps.fingerprintFold) and the DuckDB oracle's
  * `list_reduce` over `unicode(substr(...))`.
  *
  * Iterates CODE POINTS (not UTF-16 chars): the oracle's `substr`/
  * `unicode` are codepoint-based, so surrogate pairs must hash as one
  * value on both engines.
  */
object PolyHash extends Serializable {
  def hash(s: UTF8String, p: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % p
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Codegen'd polynomial rolling-hash document fingerprint — the q33 hot
  * path: the higher-order fold spelling interprets a lambda per character
  * per row. `p` (the modulus) must be a literal.
  */
case class PolyHashExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("poly_hash modulus must be a literal")
      case other =>
        TypeCheckResult.TypeCheckFailure(s"poly_hash expects (string, bigint), got $other")
    }

  override protected def nullSafeEval(s: Any, p: Any): Any =
    PolyHash.hash(s.asInstanceOf[UTF8String], p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("polyHash", PolyHash, PolyHash.getClass.getName)
    defineCodeGen(ctx, ev, (s, p) => s"$ref.hash($s, $p)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** One-pass kernel for [[NgramClipOverlapExpression]]: hash-count the
  * reference grams, then stream the candidate grams decrementing — the
  * clipped multiset overlap Σ_g min(c_g, r_g) in O(|cand| + |ref|), versus
  * the O(|distinct cand| · (|cand| + |ref|)) a per-distinct-gram
  * filter-scan (interpreted HOF) pays. Order-independent by construction,
  * so it equals the oracle's Σ min(counts) exactly.
  */
object NgramClip extends Serializable {
  def overlap(cand: ArrayData, ref: ArrayData): Long = {
    val rn = ref.numElements()
    val m = new java.util.HashMap[UTF8String, java.lang.Long](rn * 2)
    var i = 0
    while (i < rn) {
      val k = ref.getUTF8String(i)
      val c = m.get(k)
      m.put(k, if (c == null) 1L else c + 1L)
      i += 1
    }
    var acc = 0L
    val cn = cand.numElements()
    i = 0
    while (i < cn) {
      val c = m.get(cand.getUTF8String(i))
      if (c != null && c > 0L) { acc += 1L; m.put(cand.getUTF8String(i), c - 1L) }
      i += 1
    }
    acc
  }
}

/** Kernel for [[CharBigramClipExpression]]: the chrF numerator straight
  * off the two STRINGS — no per-row materialization of an n-element
  * bigram array. Code-point bigrams pack into one long (21 bits each), so
  * the clip is two linear passes over a primitive-keyed map; equal by
  * construction to clipping the substr(i, 2) string arrays (distinct
  * bigram strings ↔ distinct code-point pairs).
  */
object CharBigramClip extends Serializable {
  def overlap(candU: UTF8String, refU: UTF8String): Long = {
    val ref = refU.toString
    val cand = candU.toString
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](ref.length * 2)
    var i = 0
    var prev = -1
    while (i < ref.length) {
      val cp = ref.codePointAt(i)
      if (prev >= 0) {
        val k = java.lang.Long.valueOf((prev.toLong << 21) | cp)
        val c = m.get(k)
        m.put(k, if (c == null) 1L else c + 1L)
      }
      prev = cp
      i += Character.charCount(cp)
    }
    var acc = 0L
    i = 0
    prev = -1
    while (i < cand.length) {
      val cp = cand.codePointAt(i)
      if (prev >= 0) {
        val k = java.lang.Long.valueOf((prev.toLong << 21) | cp)
        val c = m.get(k)
        if (c != null && c > 0L) { acc += 1L; m.put(k, c - 1L) }
      }
      prev = cp
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Clipped character-bigram overlap (the chrF-2 numerator) as a native
  * expression over the raw strings.
  */
case class CharBigramClipExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_bigram_clip"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_bigram_clip expects two string args, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CharBigramClip.overlap(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charBigramClip", CharBigramClip,
      CharBigramClip.getClass.getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.overlap($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Clipped n-gram multiset overlap (the ROUGE-N numerator) as a native
  * expression: linear-time hash clip inside the projection loop (codegen
  * calls the kernel directly — one virtual call per row).
  */
case class NgramClipOverlapExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_clip_overlap"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngram_clip_overlap expects two array<string> args, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NgramClip.overlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramClip", NgramClip, NgramClip.getClass.getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.overlap($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Codegen'd Jaro-Winkler similarity — bit-compatible with DuckDB's
  * `jaro_winkler_similarity` (kernel: [[graft.operators.Fuzzy.JaroWinkler]],
  * exhaustively cross-checked; evaluation ORDER is part of the contract).
  * A native expression keeps the fuzzy-join verify predicate inside
  * whole-stage codegen next to the thresholded levenshtein.
  */
case class JaroWinklerExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"jaro_winkler expects (string, string), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.operators.Fuzzy.JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaroWinkler", graft.operators.Fuzzy.JaroWinkler,
      graft.operators.Fuzzy.JaroWinkler.getClass.getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.similarity($a.toString(), $b.toString())")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Kernel for [[ShingleHashExpression]]: distinct 60-bit md5-prefix
  * hashes (mod p) of a document's word n-gram shingles, first-occurrence
  * order — bit-identical to the Catalyst spelling
  * `array_distinct(transform(shingles(split(text,' '), n), s ->
  * conv(substr(md5(s),1,15),16,10) % p))` (TextOps.shingleHashArrayFold)
  * and the oracle's DuckDB `('0x'||substr(md5(sh),1,15))::BIGINT % p`.
  *
  * The md5 runs over the shingle's UTF-8 bytes streamed token-by-token
  * with single-space separators — no shingle string is ever built. The
  * first 15 hex chars of a digest are the top 60 bits of its first 8
  * bytes, so the hex round-trip is a shift, not a format/parse.
  */
object ShingleHash extends Serializable {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Space = Array[Byte](' ')

  def hashes(text: UTF8String, n: Int, p: Long): ArrayData = {
    // Spark's split(text, " ") keeps interior AND trailing empty tokens
    // (limit -1), so a Java split must too — empty tokens change shingles.
    val toks = text.toString.split(" ", -1)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val bytes = new Array[Array[Byte]](toks.length)
    var i = 0
    while (i < toks.length) {
      bytes(i) = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val md = digest.get()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= toks.length - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(Space)
        md.update(bytes(i + j))
        j += 1
      }
      val d = md.digest()
      val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      seen.add((top >>> 4) % p) // 16 hex chars >>> one nibble = first 15
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd shingle hasher — the shared prefix of MinHash/LSH dedup,
  * exact Jaccard, and decontamination (q35/q36/q56/q59/q64/q65). The
  * Catalyst spelling is a transform-inside-transform higher-order chain
  * (CodegenFallback: it breaks the stage's whole-stage codegen AND pays
  * interpreted lambda evals per shingle); this is one compiled call per
  * row. `n` and `p` must be literals.
  */
case class ShingleHashExpression(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("shingle_hashes n and p must be literals")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes expects (string, int, bigint), got $other")
    }

  override protected def nullSafeEval(t: Any, n: Any, p: Any): Any =
    ShingleHash.hashes(t.asInstanceOf[UTF8String],
      n.asInstanceOf[Int], p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHash", ShingleHash, ShingleHash.getClass.getName)
    defineCodeGen(ctx, ev, (t, n, p) => s"$ref.hashes($t, $n, $p)")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** JIT-friendly kernel for [[PqEncodeExpression]]: the full m-subspace
  * argmin encode of one vector against a FLAT codebook laid out as
  * `cb[(s·k + c)·subDim + i]` — all primitive loops, one call per row.
  * Distances are left-to-right double folds; ties keep the smaller code
  * (strict `<`), matching the relational `min(struct(d2, code))` spelling
  * and the DuckDB oracle's `ORDER BY d2, code`.
  */
object PqEncode extends Serializable {
  def encode(v: ArrayData, vFloat: Boolean, cb: ArrayData, m: Int): ArrayData = {
    val dim = v.numElements()
    val subDim = dim / m
    val k = cb.numElements() / (m * subDim)
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val off = (s * k + c) * subDim
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val av = if (vFloat) v.getFloat(s * subDim + i).toDouble
            else v.getDouble(s * subDim + i)
          val d = av - cb.getDouble(off + i)
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Codegen'd PQ encode: vector → its m subspace codes in ONE expression
  * evaluation — no codebook join, no m·k-row explosion per vector. The
  * codebook rides in as an array<double> literal (bounded at
  * m·codebookSize·subDim doubles — broadcast-scale by construction).
  * Shape-mismatched inputs (dim not divisible by m, codebook length not a
  * multiple of m·subDim) yield NULL.
  */
/** JIT-friendly kernel for [[Sq8RoundtripExpression]]. Rounding uses
  * BigDecimal HALF_UP — the exact semantic of Spark's `round(double)` —
  * so the compiled pass is bit-identical to the fold spelling it
  * replaces (Similarity.sq8Decode∘sq8Encode; TextSpec asserts equality).
  */
object Sq8Roundtrip extends Serializable {
  def roundtrip(v: ArrayData, vFloat: Boolean, mn: ArrayData, w: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val m = mn.getDouble(i)
      val s = w.getDouble(i)
      val r = java.math.BigDecimal.valueOf((x - m) / s)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      val code = math.min(255L, math.max(0L, r))
      out(i) = (m + code * s).toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Codegen'd SQ8 quantize→dequantize in ONE compiled pass per vector —
  * the storage-tier transform [[graft.operators.Similarity.sq8TopK]]
  * scores through. The higher-order spelling runs two interpreted
  * `transform` lambdas (6 element_at calls per dimension); this kernel
  * is one virtual call per row with tight primitive loops, keeping the
  * whole scoring stage inside whole-stage codegen.
  */
case class Sq8RoundtripExpression(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_roundtrip"

  private def vFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(DoubleType, _),
          ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"sq8_roundtrip expects (array<float|double>, array<double>, array<double>), got $other")
    }

  private def shapeOk(v: ArrayData, mn: ArrayData, w: ArrayData): Boolean =
    v.numElements() == mn.numElements() && v.numElements() == w.numElements()

  override protected def nullSafeEval(v: Any, mn: Any, w: Any): Any = {
    val av = v.asInstanceOf[ArrayData]
    val amn = mn.asInstanceOf[ArrayData]
    val aw = w.asInstanceOf[ArrayData]
    if (!shapeOk(av, amn, aw)) null
    else Sq8Roundtrip.roundtrip(av, vFloat, amn, aw)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8Kernel", Sq8Roundtrip, Sq8Roundtrip.getClass.getName)
    val self = ctx.addReferenceObj("sq8Expr", this, classOf[Sq8RoundtripExpression].getName)
    nullSafeCodeGen(ctx, ev, (v, mn, w) => {
      s"""
         |if (!$self.shapeOkPublic($v, $mn, $w)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $ref.roundtrip($v, $vFloat, $mn, $w);
         |}
       """.stripMargin
    })
  }

  def shapeOkPublic(v: ArrayData, mn: ArrayData, w: ArrayData): Boolean = shapeOk(v, mn, w)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

case class PqEncodeExpression(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  private def vFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(DoubleType, _),
          org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects (array<float|double>, array<double>, int), got $other")
    }

  private def shapeOk(v: ArrayData, cb: ArrayData, m: Int): Boolean =
    m > 0 && v.numElements() % m == 0 && v.numElements() / m > 0 &&
      cb.numElements() % (m * (v.numElements() / m)) == 0 &&
      cb.numElements() > 0

  override protected def nullSafeEval(v: Any, cb: Any, m: Any): Any = {
    val av = v.asInstanceOf[ArrayData]; val acb = cb.asInstanceOf[ArrayData]
    val mi = m.asInstanceOf[Int]
    if (!shapeOk(av, acb, mi)) null
    else PqEncode.encode(av, vFloat, acb, mi)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", PqEncode, PqEncode.getClass.getName)
    val self = ctx.addReferenceObj("pqExpr", this, classOf[PqEncodeExpression].getName)
    nullSafeCodeGen(ctx, ev, (v, cb, m) => {
      s"""
         |if (!$self.shapeOkPublic($v, $cb, $m)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $ref.encode($v, $vFloat, $cb, $m);
         |}
       """.stripMargin
    })
  }

  /** Codegen entry point for the shape guard (doGenCode references it). */
  def shapeOkPublic(v: ArrayData, cb: ArrayData, m: Int): Boolean = shapeOk(v, cb, m)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Kernel for [[GopherSignalsExpression]]: ALL Gopher quality counts in one
  * O(n) pass over the token array — bit-identical to the higher-order
  * Catalyst spelling (TextOps.qualityFilterFold) and the DuckDB oracle:
  *
  *  - tokens: `split(text, " ")` keeps interior/trailing empties (limit -1);
  *  - distinct tokens by string equality (= UTF8String binary equality on
  *    valid UTF-8);
  *  - bigram distinctness via dictionary-id pairs: tokens cannot contain
  *    the separator, so `tokA + " " + tokB` is injective in (tokA, tokB)
  *    and id-pair equality == concatenated-string equality.
  *
  * The interpreted spelling's `top_word_frac` is O(distinct × tokens) per
  * document — quadratic in document length; this dictionary count is the
  * sort-free O(n) rewrite, and the whole struct computes in one compiled
  * call per row.
  */
object GopherSignals extends Serializable {
  def signals(text: UTF8String, stops: Array[String]): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val idOf = new java.util.HashMap[String, Integer](n * 2)
    val counts = new Array[Int](n)
    val tokIds = new Array[Int](n)
    var i = 0
    while (i < n) {
      val t = toks(i)
      var id = idOf.get(t)
      if (id == null) { id = Integer.valueOf(idOf.size); idOf.put(t, id) }
      val iid = id.intValue()
      counts(iid) += 1
      tokIds(i) = iid
      i += 1
    }
    val nDistinct = idOf.size
    var maxCount = 0
    i = 0
    while (i < nDistinct) { if (counts(i) > maxCount) maxCount = counts(i); i += 1 }
    var nStop = 0
    var s = 0
    while (s < stops.length) { if (idOf.containsKey(stops(s))) nStop += 1; s += 1 }
    var nDistinctBigrams = 0
    if (n >= 2) {
      val seen = new java.util.HashSet[java.lang.Long](n * 2)
      i = 0
      while (i < n - 1) {
        seen.add(java.lang.Long.valueOf(
          (tokIds(i).toLong << 32) | (tokIds(i + 1).toLong & 0xffffffffL)))
        i += 1
      }
      nDistinctBigrams = seen.size
    }
    new GenericInternalRow(Array[Any](n, nDistinct, nStop, maxCount, nDistinctBigrams))
  }
}

/** Codegen'd Gopher quality-signal counts (Rae et al. 2021 §A1.1) — the
  * q57 hot path. The higher-order spelling pays interpreted lambdas and an
  * O(len²) top-word scan per document; this returns all five counts as one
  * struct in one compiled pass. Ratios/rounding stay in codegen'd Catalyst
  * arithmetic outside the expression, so the oracle-matched `round`
  * semantics are untouched. `stopWords` is part of the expression (not a
  * child): the set is a query-time constant, like GmfExpression's kernel.
  */
case class GopherSignalsExpression(child: Expression, stopWords: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_stop_kinds", IntegerType, nullable = false),
    StructField("top_word_count", IntegerType, nullable = false),
    StructField("n_distinct_bigrams", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gopher_signals"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_signals expects a string document, got $other")
  }

  @transient private lazy val stopsArr: Array[String] = stopWords.toArray

  override protected def nullSafeEval(t: Any): Any =
    GopherSignals.signals(t.asInstanceOf[UTF8String], stopsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherSignals", GopherSignals, GopherSignals.getClass.getName)
    val stops = ctx.addReferenceObj("gopherStops", stopsArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, t => s"$ref.signals($t, $stops)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernels for [[UnicodeNormExpression]]: NFC composition and accent
  * stripping (NFD + drop all Mn combining marks) via `java.text.Normalizer`
  * — the same utf8proc definitions DuckDB's `nfc_normalize`/`strip_accents`
  * implement, so the oracle calls its builtins and the engines agree
  * byte-for-byte. Pre-hash text normalization is what makes dedup robust
  * to encoding variants: NFC('e'+U+0301) = NFC('é'), so the composed and
  * decomposed spellings of a document hash identically.
  */
object UnicodeNorm extends Serializable {
  private val Mn = java.util.regex.Pattern.compile("\\p{Mn}+")
  def nfc(s: UTF8String): UTF8String = UTF8String.fromString(
    java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  def stripAccents(s: UTF8String): UTF8String = {
    val decomposed =
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    UTF8String.fromString(Mn.matcher(decomposed).replaceAll(""))
  }
}

/** Codegen'd Unicode normalization, `mode` ∈ nfc | strip_accents —
  * registered under DuckDB's function names so the SQL twins read
  * identically in both engines. */
case class UnicodeNormExpression(child: Expression, mode: String)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = mode match {
    case "nfc" => "nfc_normalize"
    case _ => "strip_accents"
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got $other")
  }

  override protected def nullSafeEval(s: Any): Any = mode match {
    case "nfc" => UnicodeNorm.nfc(s.asInstanceOf[UTF8String])
    case _ => UnicodeNorm.stripAccents(s.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unicodeNorm", UnicodeNorm, UnicodeNorm.getClass.getName)
    val call = if (mode == "nfc") "nfc" else "stripAccents"
    defineCodeGen(ctx, ev, s => s"$ref.$call($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session extensions: every registered model becomes a SQL-callable scalar
  * (`SELECT gmf_cmod5n(inc, wspd, phi) FROM scene`) backed by the codegen
  * expression — the sql/ surface of SURVEY.md §7.1. Two-argument crosspol
  * GMFs accept and ignore phi like the reference (gmfs.py:137-158).
  *
  * Activate via `spark.sql.extensions=graft.sql.GraftExtensions` (set by
  * GraftSession) or `builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private val scalarFns: Seq[(String, ScalarGmf)] = Seq(
    "gmf_cmod5" -> fn3(Gmf.cmod5),
    "gmf_cmod5n" -> fn3(Gmf.cmod5n),
    "gmf_cmod5n_pr_zhangA" -> fn3(Gmf.cmod5nPrZhangA),
    "gmf_cmod5n_pr_mouche1" -> fn3(Gmf.cmod5nPrMouche1),
    "gmf_cmodifr2" -> fn3(Gmf.cmodifr2),
    "gmf_rs2_v2" -> fn2(Gmf.rs2V2),
    "gmf_s1_v2" -> fn2(Gmf.s1V2),
    "gmf_rcm_noaa" -> fn2(Gmf.rcmNoaa),
    "gmf_s1_v3_ew_rec" -> fn2(Gmf.s1V3EwRec),
    "gmf_rs2_v3" -> fn2(Gmf.rs2V3),
    "gmf_rcm_v3" -> fn2(Gmf.rcmV3),
    "gmf_rcm_v4" -> fn2(Gmf.rcmV4),
    "gmf_rs2_v4" -> fn2(Gmf.rs2V4),
    "gmf_dummy" -> fn2(Gmf.dummy))

  private def fn3(f: (Double, Double, Double) => Double): ScalarGmf = new ScalarGmf {
    def eval(i: Double, w: Double, p: Double): Double = f(i, w, p)
  }
  private def fn2(f: (Double, Double) => Double): ScalarGmf = new ScalarGmf {
    def eval(i: Double, w: Double, p: Double): Double = f(i, w)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rp_bucket"),
      new ExpressionInfo("graft.sql.RpBucketExpression", "rp_bucket"),
      (args: Seq[Expression]) => args match {
        case Seq(v, p) => RpBucketExpression(v, p, Literal(0))
        case Seq(v, p, o) => RpBucketExpression(v, p, o)
        case other => throw new IllegalArgumentException(
          s"rp_bucket expects (array, planes[, offset]), got ${other.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo("graft.sql.PolyHashExpression", "poly_hash"),
      (args: Seq[Expression]) => args match {
        case Seq(s, p) => PolyHashExpression(s, Cast(p, org.apache.spark.sql.types.LongType))
        case other => throw new IllegalArgumentException(
          s"poly_hash expects (string, modulus), got ${other.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo("graft.sql.ShingleHashExpression", "shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(t, n, p) => ShingleHashExpression(t, n,
          Cast(p, org.apache.spark.sql.types.LongType))
        case other => throw new IllegalArgumentException(
          s"shingle_hashes expects (text, n, modulus), got ${other.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo("graft.sql.PqEncodeExpression", "pq_encode"),
      (args: Seq[Expression]) => args match {
        case Seq(v, cb, m) => PqEncodeExpression(v, cb, m)
        case other => throw new IllegalArgumentException(
          s"pq_encode expects (vector, flat_codebook, m), got ${other.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("sq8_roundtrip"),
      new ExpressionInfo("graft.sql.Sq8RoundtripExpression", "sq8_roundtrip"),
      (args: Seq[Expression]) => args match {
        case Seq(v, mn, w) => Sq8RoundtripExpression(v, mn, w)
        case other => throw new IllegalArgumentException(
          s"sq8_roundtrip(vec, mins, widths), got ${other.size} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("l2sub_f32"),
      new ExpressionInfo("graft.sql.L2SubExpression", "l2sub_f32"),
      (args: Seq[Expression]) => args match {
        case Seq(a, w, s) => L2SubExpression(a, w, s)
        case other => throw new IllegalArgumentException(
          s"l2sub_f32 expects (vector, codeword, sub), got ${other.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("gopher_signals"),
      new ExpressionInfo("graft.sql.GopherSignalsExpression", "gopher_signals"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => GopherSignalsExpression(t, graft.operators.TextOps.StopWords)
        case other => throw new IllegalArgumentException(
          s"gopher_signals expects (text), got ${other.length} args")
      }))
    Seq("nfc_normalize" -> "nfc", "strip_accents" -> "strip_accents").foreach {
      case (name, mode) =>
        ext.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo("graft.sql.UnicodeNormExpression", name),
          (args: Seq[Expression]) => args match {
            case Seq(s) => UnicodeNormExpression(s, mode)
            case other => throw new IllegalArgumentException(
              s"$name expects (string), got ${other.length} args")
          }))
    }
    // Spark's own runtime-filter pair (InjectRuntimeFilter machinery),
    // exposed as callable functions so operators.BloomJoin can drive it
    // deterministically: bloom_agg(xxhash64(key), items, bits) -> binary,
    // bloom_might_contain(binary_literal, xxhash64(key)) -> boolean.
    // The analyzer wraps the bare AggregateFunction in an
    // AggregateExpression, as with every built-in aggregate.
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        "org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate",
        "bloom_agg"),
      (args: Seq[Expression]) => args match {
        case Seq(v, n, b) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            v, Cast(n, org.apache.spark.sql.types.LongType),
            Cast(b, org.apache.spark.sql.types.LongType))
        case other => throw new IllegalArgumentException(
          s"bloom_agg expects (long_hash, est_items, num_bits), got ${other.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        "org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain",
        "bloom_might_contain"),
      (args: Seq[Expression]) => args match {
        case Seq(bf, v) =>
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(bf, v)
        case other => throw new IllegalArgumentException(
          s"bloom_might_contain expects (bloom_bytes, long_hash), got ${other.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("char_bigram_clip"),
      new ExpressionInfo("graft.sql.CharBigramClipExpression", "char_bigram_clip"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => CharBigramClipExpression(a, b)
        case other => throw new IllegalArgumentException(
          s"char_bigram_clip expects (cand, ref), got ${other.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("ngram_clip_overlap"),
      new ExpressionInfo("graft.sql.NgramClipOverlapExpression", "ngram_clip_overlap"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => NgramClipOverlapExpression(a, b)
        case other => throw new IllegalArgumentException(
          s"ngram_clip_overlap expects (cand_grams, ref_grams), got ${other.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo("graft.sql.JaroWinklerExpression", "jaro_winkler"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => JaroWinklerExpression(a, b)
        case other => throw new IllegalArgumentException(
          s"jaro_winkler expects (string, string), got ${other.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo("graft.sql.DotProductExpression", "dot_f32"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProductExpression(a, b)
        case other => throw new IllegalArgumentException(
          s"dot_f32 expects (array, array), got ${other.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_sketch"),
      new ExpressionInfo("graft.sql.KllSketchAgg", "kll_sketch"),
      (args: Seq[Expression]) => args match {
        case Seq(v, k) => KllSketchAgg(Cast(v, org.apache.spark.sql.types.LongType),
          Cast(k, org.apache.spark.sql.types.IntegerType)).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"kll_sketch expects (value, k), got ${other.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_sketch_w"),
      new ExpressionInfo("graft.sql.KllWeightedAgg", "kll_sketch_w"),
      (args: Seq[Expression]) => args match {
        case Seq(v, w, k) => KllWeightedAgg(
          Cast(v, org.apache.spark.sql.types.LongType),
          Cast(w, org.apache.spark.sql.types.LongType),
          Cast(k, org.apache.spark.sql.types.IntegerType)).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"kll_sketch_w expects (value, weight, k), got ${other.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_merge"),
      new ExpressionInfo("graft.sql.KllMergeAgg", "kll_merge"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => KllMergeAgg(s).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"kll_merge expects (sketch), got ${other.length} args")
      }))
    scalarFns.foreach { case (name, fn) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.sql.GmfExpression", name),
        (args: Seq[Expression]) => {
          def d(e: Expression) = Cast(e, DoubleType)
          args match {
            case Seq(i, w) => GmfExpression(fn, name, d(i), d(w), Literal(0.0))
            case Seq(i, w, p) => GmfExpression(fn, name, d(i), d(w), d(p))
            case other =>
              throw new IllegalArgumentException(
                s"$name expects (inc, wspd[, phi]), got ${other.length} args")
          }
        }))
    }
  }
}
