package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.{DotProductExpr, RollingHashExpr, ShinglesExpr}

/**
 * Session extension registering graft's custom Catalyst expressions as
 * SQL functions, so the pure-SQL surface reaches them too:
 *
 * {{{
 * SparkSession.builder().withExtensions(new GraftExtensions)...
 * // or spark.sql.extensions=graft.GraftExtensions
 * spark.sql("SELECT doc_id, rolling_hash(text) FROM docs")
 * spark.sql("SELECT word_shingles(text, 3) FROM docs")
 * }}}
 *
 * For sessions built elsewhere, [[GraftFunctions.register]] installs the
 * same functions on a live session.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val rollingHash: FunctionDescription = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
    (args: Seq[Expression]) => {
      require(args.size == 1, "rolling_hash(text) takes exactly one argument")
      RollingHashExpr(args.head)
    })

  val wordShingles: FunctionDescription = (
    FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[ShinglesExpr].getName, "word_shingles"),
    (args: Seq[Expression]) => args match {
      case Seq(text, Literal(n: Int, IntegerType)) => ShinglesExpr(text, n)
      case _ => throw new IllegalArgumentException(
        "word_shingles(text, n) requires a literal integer n")
    })

  val dotProduct: FunctionDescription = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
    (args: Seq[Expression]) => {
      require(args.size == 2, "dot_product(a, b) takes exactly two array arguments")
      DotProductExpr(args.head, args(1))
    })

  val all: Seq[FunctionDescription] = Seq(rollingHash, wordShingles, dotProduct)

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
