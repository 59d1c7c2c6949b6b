package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst probe of a broadcast Bloom filter — the codegen'd
  * replacement for the crawl pipeline's probe UDF.
  *
  * A Scala UDF on a string column pays a per-row UTF8String → java.lang
  * .String conversion (an allocation + copy) plus the UDF call boundary.
  * The sketch library hashes the UTF-8 BYTES either way
  * (`mightContainString(s)` is `mightContainBinary(utf8(s))` — verified
  * against the spark-sketch bytecode), and Spark's internal row already
  * holds those bytes as `UTF8String`, so this expression probes
  * `mightContainBinary(url.getBytes)` directly inside whole-stage
  * codegen: same bits hashed, zero String allocations, no boundary.
  * Equality with the UDF path is asserted per-row in OpsSpec (ASCII +
  * multi-byte UTF-8 + null) and the whole-pipeline crawl equality suite
  * rides on it.
  *
  * The filter arrives as a [[Broadcast]] — at 10^10-URL scale the merged
  * seen sketch is GBs and must ship once per executor, not once per task
  * inside the serialized plan. */
case class BloomProbe(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string column, got ${child.dataType}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override protected def nullSafeEval(input: Any): Any =
    bloom.value.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = ((${classOf[BloomFilter].getName}) $bcRef.value())
         |  .mightContainBinary($c.getBytes());""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {
  /** Column-API entry: `BloomProbe.probe($"url", bc)`. */
  def probe(col: Column, bloom: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomProbe(ColumnBridge.expression(col), bloom))
}
