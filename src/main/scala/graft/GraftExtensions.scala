package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library-grade session integration: registers the engine's native
  * expressions (`format_ns`, `cosine_sim`, `cosine_sim_i8`) with every
  * session built against it, so plain `spark.sql` — not just
  * [[graft.ql.Engine.sql]] — can use them. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`); [[graft.ql.Engine.sql]]
  * registers the SAME descriptors as temp functions for sessions created
  * without it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { f =>
      ext.injectFunction((new FunctionIdentifier(f.name),
        new ExpressionInfo(f.className, null, f.name, f.usage, ""),
        f.builder))
    }
    // literal predicates over normalized epoch-nano ts fold back to native
    // timestamp comparisons the parquet scan can prune with; sessions built
    // without the extension get the same rule via Tables.configure
    ext.injectOptimizerRule(_ => graft.plans.NanoTsRewrite)
  }
}

object GraftExtensions {

  /** One native function: single source of truth for name, arity,
    * docstring, and construction — consumed by both the extensions
    * injection and [[graft.ql.Engine.sql]]'s temp registration, so the
    * two surfaces can never drift. */
  final case class NativeFn(name: String, arity: Int, usage: String,
      className: String, build: Seq[Expression] => Expression) {
    def builder: Seq[Expression] => Expression = exprs => {
      require(exprs.length == arity,
        s"$name requires exactly $arity argument" +
          s"${if (arity == 1) "" else "s"}, got ${exprs.length}")
      build(exprs)
    }
  }

  val functions: Seq[NativeFn] = Seq(
    NativeFn("format_ns", 1,
      "format_ns(ts_nanos) - RFC3339 rendering with nanosecond precision (UTC)",
      classOf[graft.functions.FormatNanos].getName,
      exprs => graft.functions.FormatNanos(exprs.head, "UTC")),
    NativeFn("cosine_sim", 2,
      "cosine_sim(a, b) - cosine similarity of two array<float> embeddings",
      classOf[graft.functions.CosineSim].getName,
      exprs => graft.functions.CosineSim(exprs.head, exprs(1))),
    NativeFn("cosine_sim_i8", 2,
      "cosine_sim_i8(a, b) - cosine similarity of two int8-quantized " +
        "(array<tinyint>) embeddings, integer arithmetic",
      classOf[graft.functions.CosineSimInt8].getName,
      exprs => graft.functions.CosineSimInt8(exprs.head, exprs(1))))
}
