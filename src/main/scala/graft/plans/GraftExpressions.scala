package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (SURVEY §7.3: "custom Expression beats
  * UDF"). A Scala UDF boxes/unboxes through the encoder and is opaque
  * to codegen; these participate in whole-stage codegen directly.
  */

/** 64-bit polynomial rolling hash (Rabin–Karp style, base 1000003)
  * over the UTF-8 bytes of a string — the document-fingerprinting
  * primitive (SURVEY §2.10 fingerprint family). Unlike md5 it is a
  * single fused loop with no allocation, and unlike xxhash64 the
  * definition is trivially portable to any engine for oracle parity.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 1000003L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object GraftFunctions {
  /** Register the native functions; idempotent. (Spark 4's Column API
    * is ColumnNode-based and its Expression bridge is private[sql],
    * so the Column surface goes through the function registry.) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash64", exprs => RollingHash64(exprs.head), "built-in")

  /** Column-level access; requires register(spark) once per session. */
  def rolling_hash64(c: Column): Column =
    call_function("graft_rolling_hash64", c)
}
