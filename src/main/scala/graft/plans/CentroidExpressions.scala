package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native nearest-centroid assignment and PQ encoding (the k-means /
  * IVF / PQ build-and-encode hot path).
  *
  * The relational formulation of "which of k centroids is nearest"
  * is a broadcast join against the centroid table plus a per-id
  * `row_number()` window — ONE EXCHANGE of the full (vector-carrying)
  * frame per assignment, paid again per Lloyd iteration and per encode
  * pass. But the argmin of a driver-small centroid set is a pure
  * per-row function: these expressions compute it inside whole-stage
  * codegen with zero shuffle, zero join and zero per-row allocation
  * beyond the result.
  *
  * Bit-compatibility contract (oracle-replayed): the distance is the
  * same `dot(v,v) - 2.0*dot(v,c) + dot(c,c)` the join form computes,
  * with every dot the same sequential left-to-right double fold as
  * [[DotProduct.compute]] (float inputs widen per element); `dot(c,c)`
  * is precomputed once per centroid by the identical fold; the argmin
  * scans centroids in ascending-cid order and keeps a strict
  * improvement under `java.lang.Double.compare` — exactly the window's
  * `ORDER BY dist ASC, cid ASC` rank-1 row (Spark's nan-safe double
  * ordering). Property-specced against the join+window formulation.
  *
  * Element nulls are not tolerated (same contract as [[DotProduct]]):
  * every producer in the engine emits non-null vector elements.
  */
object CentroidOps {

  /** Flatten ascending-cid centroids to (flat row-major matrix,
    * per-centroid self-dots, dim). The self-dot fold order matches
    * [[DotProduct.compute]] so `norms(i)` is bit-identical to the
    * `dot(c, c)` column the join formulation computed.
    */
  def flatten(cents: Seq[Seq[Double]]): (Array[Double], Array[Double], Int) = {
    require(cents.nonEmpty, "nearest-centroid expression needs >= 1 centroid")
    val d = cents.head.length
    require(cents.forall(_.length == d),
      s"ragged centroid lengths (expected $d for all)")
    val flat = new Array[Double](cents.size * d)
    val norms = new Array[Double](cents.size)
    var i = 0
    cents.foreach { c =>
      var s = 0.0
      var j = 0
      while (j < d) {
        val x = c(j)
        flat(i * d + j) = x
        s += x * x
        j += 1
      }
      norms(i) = s
      i += 1
    }
    (flat, norms, d)
  }

  /** Index (not cid) of the nearest centroid: scan in storage order
    * (= ascending cid), strict improvement under Double.compare — the
    * window's (dist asc, cid asc) rank-1 row.
    */
  private def argmin(v: ArrayData, isFloat: Boolean, flat: Array[Double],
                     norms: Array[Double], d: Int): Int = {
    val n = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      vv += x * x
      i += 1
    }
    val k = norms.length
    val lim = math.min(n, d) // dot() min-truncates ragged pairs; mirror it
    var best = 0
    var bestDist = 0.0
    var c = 0
    while (c < k) {
      var vc = 0.0
      var j = 0
      while (j < lim) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        vc += x * flat(c * d + j)
        j += 1
      }
      val dist = vv - 2.0 * vc + norms(c)
      if (c == 0 || java.lang.Double.compare(dist, bestDist) < 0) {
        best = c
        bestDist = dist
      }
      c += 1
    }
    best
  }

  def nearest(v: ArrayData, isFloat: Boolean, flat: Array[Double],
              norms: Array[Double], cids: Array[Int], d: Int): Int =
    cids(argmin(v, isFloat, flat, norms, d))

  /** The `nprobe` nearest cids in (dist asc, cid asc) rank order — the
    * window's rank <= nprobe rows. O(k·nprobe) selection over the
    * distance scratch; k is driver-small by construction.
    */
  def nearestN(v: ArrayData, isFloat: Boolean, flat: Array[Double],
               norms: Array[Double], cids: Array[Int], d: Int,
               nprobe: Int): ArrayData = {
    val n = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      vv += x * x
      i += 1
    }
    val k = norms.length
    val lim = math.min(n, d)
    val dist = new Array[Double](k)
    var c = 0
    while (c < k) {
      var vc = 0.0
      var j = 0
      while (j < lim) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        vc += x * flat(c * d + j)
        j += 1
      }
      dist(c) = vv - 2.0 * vc + norms(c)
      c += 1
    }
    val take = math.min(nprobe, k)
    val out = new Array[Int](take)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < take) {
      var best = -1
      var cc = 0
      while (cc < k) {
        if (!used(cc) &&
            (best < 0 || java.lang.Double.compare(dist(cc), dist(best)) < 0))
          best = cc
        cc += 1
      }
      used(best) = true
      out(r) = cids(best)
      r += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Packed PQ codes: per contiguous subspace `sub`, the argmin over
    * that subspace's ksub codebook centroids of the residual/subvector
    * L2² — identical doubles and tie-break to the join+window encode
    * over `slice()`d subvectors. `flat` is laid out
    * `[(sub*ksub + cid)*d + j]`, cids dense 0..ksub-1 per sub.
    */
  def pqCodes(v: ArrayData, isFloat: Boolean, flat: Array[Double],
              norms: Array[Double], d: Int, m: Int, ksub: Int): ArrayData = {
    val n = v.numElements()
    if (n != m * d)
      throw new IllegalArgumentException(
        s"pq_codes: vector length $n != m*d = ${m * d}")
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val base = sub * d
      var vv = 0.0
      var j = 0
      while (j < d) {
        val x = if (isFloat) v.getFloat(base + j).toDouble
                else v.getDouble(base + j)
        vv += x * x
        j += 1
      }
      var best = 0
      var bestDist = 0.0
      var c = 0
      while (c < ksub) {
        val cbase = (sub * ksub + c) * d
        var vc = 0.0
        j = 0
        while (j < d) {
          val x = if (isFloat) v.getFloat(base + j).toDouble
                  else v.getDouble(base + j)
          vc += x * flat(cbase + j)
          j += 1
        }
        val dist = vv - 2.0 * vc + norms(sub * ksub + c)
        if (c == 0 || java.lang.Double.compare(dist, bestDist) < 0) {
          best = c
          bestDist = dist
        }
        c += 1
      }
      out(sub) = best
      sub += 1
    }
    ArrayData.toArrayData(out)
  }

  def nearestCell(v: Column, cents: Seq[(Int, Seq[Double])]): Column =
    ColumnBridge.column(NearestCellExpr(ColumnBridge.expression(v), cents))

  def nearestCells(v: Column, cents: Seq[(Int, Seq[Double])],
                   nprobe: Int): Column =
    ColumnBridge.column(
      NearestCellsExpr(ColumnBridge.expression(v), cents, nprobe))

  def pqCodes(v: Column, books: Seq[Seq[Double]], m: Int, ksub: Int): Column =
    ColumnBridge.column(PqCodesExpr(ColumnBridge.expression(v), books, m, ksub))
}

/** Shared shape of the three centroid expressions: one float/double
  * array child, driver-small centroid state embedded as reference
  * objects in generated code.
  */
trait CentroidExprBase extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs a float/double array, got ${other.catalogString}")
    }
  protected def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** cid of the nearest centroid (ascending-cid tie-break). `cents` may
  * carry any distinct cid values; they are scanned in ascending order.
  */
case class NearestCellExpr(child: Expression, cents: Seq[(Int, Seq[Double])])
    extends CentroidExprBase {

  override def dataType: DataType = IntegerType

  @transient private lazy val sorted = {
    val s = cents.sortBy(_._1)
    require(s.map(_._1).distinct.size == s.size,
      "nearest_cell: duplicate cids in centroid set")
    s
  }
  @transient private lazy val (flat, norms, d) =
    CentroidOps.flatten(sorted.map(_._2))
  @transient private lazy val cidArr: Array[Int] = sorted.map(_._1).toArray

  override def nullSafeEval(input: Any): Any =
    CentroidOps.nearest(input.asInstanceOf[ArrayData], isFloat, flat, norms,
      cidArr, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    val cidRef = ctx.addReferenceObj("centCids", cidArr, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CentroidOps.nearest($c, $isFloat, $flatRef, $normRef, $cidRef, $d);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellExpr =
    copy(child = newChild)

  // elide the centroid payload from plan strings (k·dim doubles would
  // otherwise print per occurrence)
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"k=${cents.size}")

  override def prettyName: String = "nearest_cell"
}

/** The `nprobe` nearest cids in rank order — the probe-replication set
  * of the blocked/IVF paths, without the per-id window exchange.
  */
case class NearestCellsExpr(child: Expression, cents: Seq[(Int, Seq[Double])],
                            nprobe: Int)
    extends CentroidExprBase {

  require(nprobe >= 1, "nearest_cells: need nprobe >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val sorted = {
    val s = cents.sortBy(_._1)
    require(s.map(_._1).distinct.size == s.size,
      "nearest_cells: duplicate cids in centroid set")
    s
  }
  @transient private lazy val (flat, norms, d) =
    CentroidOps.flatten(sorted.map(_._2))
  @transient private lazy val cidArr: Array[Int] = sorted.map(_._1).toArray

  override def nullSafeEval(input: Any): Any =
    CentroidOps.nearestN(input.asInstanceOf[ArrayData], isFloat, flat, norms,
      cidArr, d, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    val cidRef = ctx.addReferenceObj("centCids", cidArr, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CentroidOps.nearestN($c, $isFloat, $flatRef, $normRef, $cidRef, $d, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)

  override def stringArgs: Iterator[Any] =
    Iterator(child, s"k=${cents.size}", s"nprobe=$nprobe")

  override def prettyName: String = "nearest_cells"
}

/** Packed PQ codes (array<int>, one code per subspace in subspace
  * order) — the zero-shuffle form of pqEncodePacked's explode + join +
  * window + groupBy pipeline. `books` is ordered (sub asc, cid asc),
  * dense m·ksub rows.
  */
case class PqCodesExpr(child: Expression, books: Seq[Seq[Double]],
                       m: Int, ksub: Int)
    extends CentroidExprBase {

  require(m >= 1 && ksub >= 1 && books.size == m * ksub,
    s"pq_codes: need m*ksub = ${m * ksub} dense codebook rows, got ${books.size}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val (flat, norms, d) = CentroidOps.flatten(books)

  override def nullSafeEval(input: Any): Any =
    CentroidOps.pqCodes(input.asInstanceOf[ArrayData], isFloat, flat, norms,
      d, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("bookFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("bookNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CentroidOps.pqCodes($c, $isFloat, $flatRef, $normRef, $d, $m, $ksub);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodesExpr =
    copy(child = newChild)

  override def stringArgs: Iterator[Any] =
    Iterator(child, s"m=$m", s"ksub=$ksub")

  override def prettyName: String = "pq_codes"
}
