package graft.operators

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.model.{RobotsEntry, RobotsRule}

/** robots.txt evaluation as a broadcast-joined ruleset (north rule; the
  * reference has none). The `robots` dimension is tiny relative to the
  * frontier (one row per host with rules), so it broadcast-joins on `host`
  * and the longest-prefix match runs as a codegen'd expression per row —
  * no shuffle added to the frontier path. Hosts without an entry are
  * allowed (rules column null after the left join).
  */
object RobotsFilter {

  /** Static kernel over Spark internal types; delegates to the single spec
    * in [[RobotsMatcher]]. rules: array<struct<allow boolean, prefix string>>. */
  def allowedKernel(rules: ArrayData, url: UTF8String): Boolean = {
    if (rules == null) return true
    val n = rules.numElements()
    val scalaRules = new Array[RobotsRule](n)
    var i = 0
    while (i < n) {
      val row = rules.getStruct(i, 2)
      scalaRules(i) = RobotsRule(row.getBoolean(0), row.getUTF8String(1).toString)
      i += 1
    }
    RobotsMatcher.allowed(scala.collection.immutable.ArraySeq.unsafeWrapArray(scalaRules),
      RobotsMatcher.pathOf(url.toString))
  }

  def robots_allowed(rules: Column, url: Column): Column =
    EU.column(RobotsAllowedExpr(EU.expression(rules), EU.expression(url)))

  /** Left-join pending rows against the broadcast robots dimension and keep
    * the allowed ones; the host's `crawl_delay` rides along (null when the
    * host has no robots entry) so [[Politeness.schedule]] can tighten the
    * per-host budget. `pending` must have (host, url). */
  def filterAllowed(pending: DataFrame, robots: Dataset[RobotsEntry]): DataFrame = {
    val dim = broadcast(robots.toDF().select(col("host"), col("rules"), col("crawl_delay")))
    pending
      .join(dim, Seq("host"), "left")
      .where(robots_allowed(col("rules"), col("url")))
      .drop("rules")
  }
}

/** `robots_allowed(rules, url)` — longest-prefix-match rule evaluation;
  * null rules (no entry for host) => allowed. Codegen via static call. */
case class RobotsAllowedExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "robots_allowed"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val rules = left.eval(input)   // null allowed (host with no entry)
    val url = right.eval(input)
    if (url == null) false
    else RobotsFilter.allowedKernel(
      rules.asInstanceOf[ArrayData], url.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val resultCode =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.value} = false;
        if (!${rightGen.isNull}) {
          ${ev.value} = graft.operators.RobotsFilter.allowedKernel(
            ${leftGen.isNull} ? null : ${leftGen.value}, ${rightGen.value});
        }
      """
    ev.copy(code = resultCode, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
