package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** AS-OF lookup into a time-sorted struct array: the LAST element whose
  * leading `bigint` field is `<=` the probe time, or null when none is
  * (binary search, O(log n) per probe, zero allocation, whole-stage
  * codegen).
  *
  * The probe kernel of [[graft.operators.AsOfJoin.asOfBroadcast]]: the
  * right side packs each key's timeline into ONE sorted
  * `array<struct<t, values...>>` row, the array ships inside a broadcast
  * hash join, and this expression replaces the merge exec's whole
  * shuffle+sort with a per-row search — the zero-exchange as-of for
  * dimension-sized right sides. Ties on the time field resolve to the
  * LAST element in array order (`sort_array` ascending ⇒ greatest value
  * tuple), documented in the operator.
  */
case class SortedAsOfLookup(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "sorted_asof_lookup"

  private lazy val elementType: StructType =
    left.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def dataType: DataType = elementType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(s: StructType, _), LongType)
      if s.nonEmpty && s.head.dataType == LongType => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<struct<bigint, ...>>, bigint), " +
        s"got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val t = b.asInstanceOf[Long]
    val n = elementType.length
    var lo = 0
    var hi = arr.numElements() - 1
    var found = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getStruct(mid, n).getLong(0) <= t) { found = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (found < 0) null else arr.getStruct(found, n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = elementType.length
    val rowCls = classOf[InternalRow].getName
    nullSafeCodeGen(ctx, ev, (a, t) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val found = ctx.freshName("found")
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements() - 1;
         |int $found = -1;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($a.getStruct($mid, $n).getLong(0) <= $t) { $found = $mid; $lo = $mid + 1; }
         |  else $hi = $mid - 1;
         |}
         |if ($found < 0) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
         |} else {
         |  ${ev.value} = ($rowCls) $a.getStruct($found, $n);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
