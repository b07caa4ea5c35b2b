package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BasePredicate, Expression, NamedExpression, Predicate, Projection, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project}

/** A Project/Filter-only DataFrame transformation compiled down to a
  * per-[[InternalRow]] function — the bridge that lets a DSv2
  * `MicroBatchStream` reader run the SAME Catalyst decode expressions the
  * batch path declares as `Column`s ([[KafkaEventSource.decodeRaw]]), with
  * zero semantic drift between the two.
  *
  * Why this exists: a DSv2 streaming scan must produce decoded
  * [[InternalRow]]s at the reader (the table's declared schema is the
  * DECODED shape), but the decode logic (`from_json` / Avro, malformed-row
  * drop, system-column synthesis) is authored once at the DataFrame layer.
  * Re-implementing it row-wise by hand would fork the semantics; instead
  * the driver ANALYZES the DataFrame transformation over a dummy relation
  * and ships the resolved Project/Filter chain to executors, where each
  * stage compiles to a codegen'd [[UnsafeProjection]] / [[BasePredicate]]
  * (interpreted fallback is Spark's own). Per-row cost is therefore the
  * batch path's expression cost — no Row boxing, no UDF.
  *
  * Scale: the pipeline is stateless and compiled once per reader; readers
  * stream rows through reused UnsafeRow buffers (the DSv2 reader contract:
  * a row is valid until the next `next()`), so a 1000-executor stream pays
  * only the expression evaluation itself.
  */
object RowPipeline {

  /** One resolved stage; `input` is the child operator's output the stage's
    * expressions are bound against. Catalyst expressions are serializable,
    * so stages ship inside the reader factory task closure.
    */
  sealed trait Stage extends Serializable
  final case class ProjectStage(exprs: Seq[NamedExpression], input: Seq[Attribute]) extends Stage
  final case class FilterStage(cond: Expression, input: Seq[Attribute]) extends Stage

  /** Compile `df`'s ANALYZED plan (must be a Project/Filter chain over a
    * single leaf — exactly what a decode transformation is) into bottom-up
    * stages. The analyzed (not optimized) plan is used deliberately: the
    * optimizer would constant-fold a transformation over an empty dummy
    * relation away entirely. The one analyzer artifact that is not directly
    * evaluable — `UpdateFields` from `Column.dropFields` (the JSON codec's
    * corrupt-marker strip) — is rewritten by its two dedicated optimizer
    * rules, which never touch the relation itself.
    */
  def compile(df: DataFrame): Seq[Stage] = {
    import org.apache.spark.sql.catalyst.optimizer.{OptimizeUpdateFields, ReplaceUpdateFieldsExpression}
    def walk(plan: LogicalPlan): Seq[Stage] = plan match {
      case Project(exprs, child) => walk(child) :+ ProjectStage(exprs, child.output)
      case Filter(cond, child) => walk(child) :+ FilterStage(cond, child.output)
      case _: LeafNode => Nil
      case other => throw new IllegalArgumentException(
        s"RowPipeline supports Project/Filter chains only, got ${other.nodeName}")
    }
    walk(ReplaceUpdateFieldsExpression(OptimizeUpdateFields(df.queryExecution.analyzed)))
  }

  /** Executor-side evaluator: apply every stage in order; `null` = row
    * dropped by a filter stage. Not thread-safe (projection buffers are
    * reused) — create one per reader.
    */
  final class Eval(stages: Seq[Stage]) {
    private val steps: Seq[Either[Projection, BasePredicate]] = stages.map {
      case ProjectStage(exprs, input) => Left(UnsafeProjection.create(exprs, input))
      case FilterStage(cond, input) => Right(Predicate.create(cond, input))
    }
    steps.foreach {
      case Left(p) => p.initialize(0)
      case Right(p) => p.initialize(0)
    }

    def apply(row: InternalRow): InternalRow = {
      var cur = row
      var i = 0
      while (i < steps.length) {
        steps(i) match {
          case Left(project) => cur = project(cur)
          case Right(predicate) => if (!predicate.eval(cur)) return null
        }
        i += 1
      }
      cur
    }
  }
}
