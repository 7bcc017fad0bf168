package graft.kg.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Random-hyperplane LSH band keys for cosine similarity (the classic
  * SimHash-for-vectors scheme): plane j's sign bit is `dot(emb, plane_j) > 0`;
  * `rows` sign bits are packed into one band key, `bands` keys emitted per
  * vector. Two vectors at angle θ agree on one sign bit with probability
  * 1 - θ/π, so P(some band collides) = 1 - (1 - (1-θ/π)^rows)^bands — the
  * tunable recall/candidate-noise knob of the blocked embedding near-dup join
  * (see graft.ops.Dedup.embeddingNearDups).
  */
object SignBandsAlgo {
  /** planes is row-major: plane (b*rows + r) occupies [i*dim, (i+1)*dim). */
  def keys(emb: ArrayData, planes: Array[Double], bands: Int, rows: Int): ArrayData = {
    val dim = planes.length / (bands * rows)
    val n = math.min(dim, emb.numElements())
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < rows) {
        val base = (b * rows + r) * dim
        var s = 0.0
        var i = 0
        while (i < n) { s += emb.getDouble(i) * planes(base + i); i += 1 }
        if (s > 0) key |= (1L << r)
        r += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Deterministic Gaussian hyperplanes (seeded — no wall-clock randomness,
    * per SURVEY.md §7.1; java.util.Random's LCG + Box-Muller are stable
    * across JVMs, so signatures are reproducible everywhere).
    */
  def planes(bands: Int, rows: Int, dim: Int, seed: Long = 42L): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bands * rows * dim)(rnd.nextGaussian())
  }
}

/** sign_bands(array<double>): array<long> — codegen'd (one tight loop over
  * all bands*rows planes; the HOF spelling `transform(planes, p ->
  * aggregate(...))` would interpret two lambdas per component).
  */
case class SignBands(child: Expression, planes: Array[Double], bands: Int, rows: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_bands"

  override protected def nullSafeEval(v: Any): Any =
    SignBandsAlgo.keys(v.asInstanceOf[ArrayData], planes, bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.kg.expr.SignBandsAlgo.keys($a, $planesRef, $bands, $rows)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SignBands {
  /** Column-API entry point. */
  def signBands(emb: Column, planes: Array[Double], bands: Int, rows: Int): Column =
    Bridge.column(SignBands(Bridge.expression(emb), planes, bands, rows))
}
