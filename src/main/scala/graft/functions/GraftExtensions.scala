package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Registration of the graft native functions, both as a
  * `SparkSessionExtensions` class (for
  * `SparkSession.builder.withExtensions` / `spark.sql.extensions`) and as
  * an imperative hook for already-built sessions (Engine.tune).
  *
  * SQL surface: `cosine_sim(array<double>, array<double>) -> double`,
  * `minhash_sig(array<string>, k) -> array<bigint>`,
  * `simhash64(array<string>) -> bigint`.
  */
object GraftFunctions {

  private def minhashBuilder(args: Seq[Expression]): Expression = {
    val k = args match {
      case Seq(_, Literal(v: Int, _)) => v
      case Seq(_) => 32
      case _ => throw new IllegalArgumentException(
        "minhash_sig(arr[, k literal int])")
    }
    MinHashSig(args.head, k)
  }

  private def intLit(e: Expression, default: Int): Int = e match {
    case Literal(v: Int, _) => v
    case _ => default
  }

  private def boolLit(e: Expression, default: Boolean): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case _ => default
  }

  private def topkBuilder(args: Seq[Expression]): Expression = {
    val k = if (args.length > 1) intLit(args(1), 3) else 3
    val idAsc = if (args.length > 2) boolLit(args(2), true) else true
    BoundedTopK(args.head, k, idAsc)
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", args => CosineSim(args(0), args(1))),
    ("minhash_sig", minhashBuilder),
    ("shingle_hashes", args => ShingleHashes(args(0),
      if (args.length > 1) intLit(args(1), 3) else 3)),
    ("minhash_sig_longs", args => MinHashSigLongs(args(0),
      if (args.length > 1) intLit(args(1), 32) else 32)),
    ("simhash64", args => SimHash64(args.head)),
    ("poly_hash", args => PolyHash64(args.head)),
    ("bounded_topk", topkBuilder))

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit = all.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
