package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the frontier's URL kernel — preferred
  * over Scala UDFs (SURVEY.md §4 "custom Catalyst needs"): these stay
  * inside whole-stage codegen (doGenCode emits a static call, no closure
  * dispatch, no Option boxing per row).
  *
  * Static entry points (called from generated code) live in
  * [[UrlExpressions]]; the expressions are registered for SQL via
  * [[GraftExtensions]] (`SELECT url_host(url)` etc.).
  */
object UrlExpressions {

  // static shims for generated code: UTF8String in/out, null for "invalid"
  def canonicalize(u: UTF8String): UTF8String =
    graft.core.UrlNorm.canonicalize(u.toString)
      .map(UTF8String.fromString).orNull

  def host(u: UTF8String): UTF8String =
    graft.core.UrlNorm.host(u.toString).map(UTF8String.fromString).orNull

  def urlHash(u: UTF8String): Long =
    graft.core.UrlNorm.urlHash(u.toString)

  def url_canonicalize(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(UrlCanonicalize(org.apache.spark.sql.GraftShim.expression(c)))
  def url_host(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(UrlHost(org.apache.spark.sql.GraftShim.expression(c)))
  def url_hash64(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(UrlHash64(org.apache.spark.sql.GraftShim.expression(c)))
}

/** RFC-3986 canonical form of an http(s) URL; null for other schemes. */
case class UrlCanonicalize(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    UrlExpressions.canonicalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.UrlExpressions.canonicalize($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(c: Expression): UrlCanonicalize = copy(c)
  override def prettyName: String = "url_canonicalize"
}

/** Lowercased host of an http(s) URL; null if unparseable. */
case class UrlHost(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    UrlExpressions.host(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.UrlExpressions.host($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(c: Expression): UrlHost = copy(c)
  override def prettyName: String = "url_host"
}

/** xxh64 of the raw string bytes (seed 42) — the frontier membership key.
  * Matches the scalar `UrlNorm.urlHash` exactly, so driver-side oracles and
  * executor-side plans agree bit-for-bit. */
case class UrlHash64(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    UrlExpressions.urlHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlExpressions.urlHash($c)")
  override protected def withNewChildInternal(c: Expression): UrlHash64 = copy(c)
  override def prettyName: String = "url_hash64"
}

/** SparkSessionExtensions registration: make the URL kernel available to
  * SQL (`spark.sql("SELECT url_host(url) ...")`). Install with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((FunctionIdentifier("url_canonicalize"),
      new ExpressionInfo(classOf[UrlCanonicalize].getName, "url_canonicalize"),
      (exprs: Seq[Expression]) => UrlCanonicalize(exprs.head)))
    e.injectFunction((FunctionIdentifier("url_host"),
      new ExpressionInfo(classOf[UrlHost].getName, "url_host"),
      (exprs: Seq[Expression]) => UrlHost(exprs.head)))
    e.injectFunction((FunctionIdentifier("url_hash64"),
      new ExpressionInfo(classOf[UrlHash64].getName, "url_hash64"),
      (exprs: Seq[Expression]) => UrlHash64(exprs.head)))
  }
}
