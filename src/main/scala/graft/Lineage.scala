package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Column-level lineage: map every output column of a DataFrame to the set
  * of SOURCE columns (table.column at the scan leaves) it derives from.
  *
  * Works on the ANALYZED logical plan — before the optimizer collapses
  * projections — by propagating source sets bottom-up through expression
  * references: a leaf attribute owns itself; any aliased expression owns
  * the union of its references' sources; everything else passes through.
  * Joins, aggregates, windows, generators (explode) and set operations all
  * reduce to the same reference walk, so there is no per-operator special
  * case beyond naming the leaves.
  *
  * This is governance tooling, not execution: the product is the
  * impact-analysis answer ("which fact columns feed this metric?") that a
  * catalog integration would publish.
  */
object Lineage {

  /** Human-readable name for a scan leaf. */
  private def leafName(leaf: LeafNode): String = leaf match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.table).getOrElse {
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation =>
            val p = fs.location.rootPaths.headOption.map(_.getName)
              .getOrElse("scan")
            p.replaceAll("\\.parquet$|\\.orc$|\\.csv$|\\.json$", "")
          case other => other.getClass.getSimpleName
        }
      }
    case other => other.nodeName
  }

  /** exprId -> source-column set for every attribute the plan defines. */
  private def buildMemo(plan: LogicalPlan): mutable.Map[ExprId, Set[String]] = {
    val memo = mutable.Map[ExprId, Set[String]]()
    def refs(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Set[String] =
      e.references.toSeq.flatMap(a => memo.getOrElse(a.exprId, Set.empty))
        .toSet
    def walk(p: LogicalPlan): Unit = {
      p match {
        case leaf: LeafNode =>
          val t = leafName(leaf)
          leaf.output.foreach(a => memo(a.exprId) = Set(s"$t.${a.name}"))
        case node =>
          node.children.foreach(walk)
          // any NamedExpression anywhere in the node (projections,
          // aggregate expressions, window expression lists, generator
          // output) defines new attributes from its references
          node.expressions.foreach { e =>
            e.foreach {
              case a: Alias => memo(a.exprId) = refs(a.child)
              case _ => ()
            }
          }
          // generators (explode & co.): their output attrs derive from the
          // generator input
          node match {
            case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
              g.generatorOutput.foreach(a =>
                memo(a.exprId) = refs(g.generator))
            case _ => ()
          }
          // union-like nodes: output attrs merge the corresponding child
          // attrs positionally
          node match {
            case u: org.apache.spark.sql.catalyst.plans.logical.Union =>
              u.output.zipWithIndex.foreach { case (a, i) =>
                memo(a.exprId) = u.children
                  .flatMap(c => memo.getOrElse(c.output(i).exprId, Set.empty))
                  .toSet
              }
            case _ => ()
          }
      }
    }
    walk(plan)
    memo
  }

  /** Output column name -> source columns ("table.column"). */
  def columnLineage(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val memo = buildMemo(plan)
    plan.output.map { a: Attribute =>
      a.name -> memo.getOrElse(a.exprId, Set.empty)
    }.toMap
  }

  /** Lineage of a registered SparkEntry query, rendered one line per
    * output column — the shape a catalog publisher would emit.
    */
  def report(df: DataFrame): String =
    columnLineage(df).toSeq.sortBy(_._1).map { case (c, srcs) =>
      s"$c <- ${srcs.toSeq.sorted.mkString(", ")}"
    }.mkString("\n")
}
