package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.SparkSessionExtensions

/** The engine's SQL function surface: every graft column function exposed
  * to `spark.sql(...)` under a `graft_` prefix, so SQL-text users get the
  * same codegen'd kernels as the Column API.
  *
  * Two attachment paths:
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (standard extension injection at session build);
  *  - runtime: `GraftFunctions.register(spark)` on a live session.
  *
  * Builders compose the existing Column implementations, so SQL and the
  * Scala API cannot drift. */
object GraftFunctions {

  /** name → (arity, Column-level implementation). */
  val all: Map[String, (Int, Seq[Column] => Column)] = Map(
    "graft_dot" -> (2, args => VectorMath.dot(args(0), args(1))),
    "graft_cosine" -> (2, args => VectorMath.cosine(args(0), args(1))),
    "graft_langid" -> (1, args => TextAnalysis.langId(args(0))),
    "graft_token_count" -> (1, args => TextAnalysis.tokenCount(args(0))),
    "graft_bpeish_count" -> (1, args => TextAnalysis.bpeishTokenCount(args(0))),
    "graft_text_stats" -> (1, args => TextAnalysis.textStats(args(0))),
    "graft_simhash" -> (2, args => Sketches.simhash64(args(0), litInt(args(1)))),
    "graft_minhash" -> (3, args =>
      Sketches.minhashSig(args(0), litInt(args(1)), litInt(args(2)))),
    "graft_shingles" -> (2, args => Sketches.shingleSet(args(0), litInt(args(1)))),
    "graft_fingerprint" -> (1, args => Fingerprint.fingerprint64(args(0))),
    "graft_pg_array" -> (1, args =>
      graft.cdc.PgValues.castArrayText(args(0), graft.cdc.PgTypes.TextOid)),
    "graft_lsn_format" -> (1, args => graft.cdc.Lsn.formatCol(args(0))),
    "graft_lsn_parse" -> (1, args => graft.cdc.Lsn.parseCol(args(0))),
    "graft_hyperplane_bucket" -> (4, args => VectorMath.hyperplaneBucket(
      args(0), litInt(args(1)), litInt(args(2)), litInt(args(3)))),
    "graft_word_ngrams" -> (2, args => TextAnalysis.wordNgrams(args(0), litInt(args(1)))),
    "graft_jaccard" -> (3, args => Sketches.jaccard(args(0), args(1), litInt(args(2)))))

  private def litInt(c: Column): Int =
    GraftBridge.expression(c) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case e => throw new IllegalArgumentException(
        s"expected an integer literal argument, got $e")
    }

  private def builder(name: String): Seq[Expression] => Expression = {
    val (arity, impl) = all(name)
    exprs => {
      require(exprs.length == arity, s"$name expects $arity arguments")
      GraftBridge.fullExpression(impl(exprs.map(GraftBridge.column)))
    }
  }

  /** Attach every function to a live session. */
  def register(spark: SparkSession): Unit =
    all.keys.foreach(n => GraftBridge.registerFunction(spark, n, builder(n)))

  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    all.keys.foreach { n =>
      ext.injectFunction((FunctionIdentifier(n),
        new ExpressionInfo("graft.functions.GraftFunctions", n), builder(n)))
    }
}

/** `spark.sql.extensions` entry point (reference analogue: the engine's
  * function surface travels with the session, as the reference's SQL
  * surface travels with the Snowflake connection). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
