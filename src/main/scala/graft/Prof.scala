package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.Dedup

/** Dev profiling harness: times pipeline sub-stages on SPARK_GRAFT_SF_DIR.
  * Not part of the driver contract. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    import org.apache.spark.sql.functions._
    import graft.pipeline.Text
    if (args.contains("triangles")) { profTriangles(spark, sfDir); return }
    time("warmup count")(docs.count())
    val sets = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), Text.shinglesOfTokens(col("__toks"), 3).as("__set"))
    time("tokenize only")(
      docs.select(Text.tokens(col("text")).as("t")).select(size(col("t"))).count())
    time("shingle sets")(sets.select(size(col("__set"))).count())
    time("exploded shingles")(sets.select(explode(col("__set"))).count())
    time("exploded shingles x2")(sets.select(explode(col("__set"))).count())
    time("explode cheap child")(docs.select(explode(
      split(lower(col("text")), "[^a-z0-9]+")).as("t")).count())
    time("explode after shuffle")(sets.repartition(32)
      .select(explode(col("__set"))).count())
    time("explode after cache")({
      val c = sets.cache(); c.count()
      val n = c.select(explode(col("__set"))).count(); c.unpersist(); n
    })
    time("exploded+hash")(sets.select(col("doc_id"), explode(col("__set")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h")).count())
    time("signatures")(
      Dedup.minhashSignatures(docs, "doc_id", "text", 64, 3).count())
    time("lshBuckets")(Dedup.lshBuckets(docs, "doc_id", "text", 16, 4, 3).count())
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text", 16, 4, 3)
    time("candidates")(cands.count())
    time("jaccardVerify")(
      Dedup.jaccardVerify(docs, cands, "doc_id", "text", 3).count())
    time("jaccardPairs(all)")(
      Dedup.jaccardPairs(docs, "doc_id", "text", 0.3, 3).count())
    time("nearDuplicates")(
      Dedup.nearDuplicates(docs, "doc_id", "text", 0.3, 16, 4, 3).count())
    spark.stop()
  }

  /** Stage split of the graph_triangles bench row: fixture pair-build vs
    * the triangles normalize/orient/count stages. */
  private def profTriangles(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    def pairs = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    time("warmup lineitem count")(li.count())
    time("pair fan-out")(pairs.count())
    val norm = pairs.select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    time("normalize+distinct")(norm.count())
    time("full triangles")(
      graft.operators.GraphOps.triangles(pairs).count())
    time("full triangles again")(
      graft.operators.GraphOps.triangles(pairs).count())
    // alternative fixture: per-order sorted part array, pairs by index —
    // ONE groupBy shuffle instead of the self-join's two-sided shuffle
    def pairsArr = li.groupBy("l_orderkey")
      .agg(array_sort(collect_set("l_partkey")).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(" +
          "slice(ps, i + 2, greatest(size(ps) - i - 1, 0)), " +
          "y -> struct(x as src, y as dst))))")).as("e"))
      .select(col("e.src"), col("e.dst"))
    time("pairsArr fan-out")(pairsArr.count())
    time("triangles over pairsArr")(
      graft.operators.GraphOps.triangles(pairsArr).count())
    time("triangles over pairsArr 2")(
      graft.operators.GraphOps.triangles(pairsArr).count())
    spark.stop()
  }
}
