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
}
