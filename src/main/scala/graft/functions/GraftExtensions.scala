package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for the native expressions, two ways:
  *
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` injects them
  *    at session build time (the standard extension-point wiring);
  *  - [[GraftFunctions.register]] adds them to an existing session's
  *    FunctionRegistry (tests, notebooks).
  *
  * After either, `SELECT minhash_sig(shingles, 96)`, `simhash60(...)`,
  * `word_shingles(text, 3)`, `cosine_sim(a, b)`, `dot_product(a, b)` work
  * from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // whole-operator custom plan (graft.plans): bounded top-k per group,
    // plus the optimizer rule that rewrites the stock window-rank form
    // into it (LogicalPlan + Rule + Strategy + SparkPlan)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
  }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) for every native expression. */
  val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args.head, intArg(args(1), "numHashes"))),
    ("simhash60",
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (args: Seq[Expression]) => SimHash60(args.head)),
    ("word_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => WordShingles(args.head, intArg(args(1), "n"))),
    ("char_ngrams",
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (args: Seq[Expression]) => CharNgrams(args.head, intArg(args(1), "n"))),
    ("rolling_hashes",
      new ExpressionInfo(classOf[RollingHashes].getName, "rolling_hashes"),
      (args: Seq[Expression]) => RollingHashes(args.head, intArg(args(1), "k"))),
    ("cosine_sim",
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args.head, args(1))),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))),
    ("deflate_len",
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (args: Seq[Expression]) => DeflateLen(args.head)),
    ("zorder64",
      new ExpressionInfo(classOf[ZOrder64].getName, "zorder64"),
      (args: Seq[Expression]) => ZOrder64(args.head, args(1))),
    ("word_gram_hashes",
      new ExpressionInfo(classOf[WordGramHashes].getName, "word_gram_hashes"),
      (args: Seq[Expression]) => WordGramHashes(args.head, intArg(args(1), "n"))),
    ("winnow_fps",
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      (args: Seq[Expression]) => WinnowFps(args.head,
        intArg(args(1), "k"), intArg(args(2), "w"))),
    ("word_blocks",
      new ExpressionInfo(classOf[WordBlocks].getName, "word_blocks"),
      (args: Seq[Expression]) => WordBlocks(args.head, intArg(args(1), "n"))))

  /** Register into an already-running session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
