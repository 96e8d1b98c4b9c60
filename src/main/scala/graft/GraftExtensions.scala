package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library-grade session integration: registers the engine's native
  * expressions (`format_ns`, `cosine_sim`, `cosine_sim_i8`) with every
  * session built against it, so plain `spark.sql` — not just
  * [[graft.ql.Engine.sql]] — can use them. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`); the Engine's per-call
  * registration remains for sessions created without it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, usage: String, arity: Int,
      build: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      (exprs: Seq[Expression]) => {
        require(exprs.length == arity,
          s"$name requires exactly $arity argument${if (arity == 1) "" else "s"}, " +
            s"got ${exprs.length}")
        build(exprs)
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    val fns = Seq(
      fn("format_ns",
        "format_ns(ts_nanos) - RFC3339 rendering with nanosecond precision (UTC)",
        1, exprs => graft.functions.FormatNanos(exprs.head, "UTC")),
      fn("cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two array<float> embeddings",
        2, exprs => graft.functions.CosineSim(exprs.head, exprs(1))),
      fn("cosine_sim_i8",
        "cosine_sim_i8(a, b) - cosine similarity of two int8-quantized " +
          "(array<tinyint>) embeddings, integer arithmetic",
        2, exprs => graft.functions.CosineSimInt8(exprs.head, exprs(1))))
    fns.foreach(ext.injectFunction)
  }
}
