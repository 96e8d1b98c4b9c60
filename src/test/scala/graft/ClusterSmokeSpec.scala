package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Launches [[ClusterSmoke]] in a CHILD JVM (one SparkContext per JVM —
  * the shared `local[4]` test context cannot become a local-cluster) and
  * checks the multi-executor branches against expectations computed here
  * on the single-JVM session. Runs in CI conditions whenever SPARK_HOME
  * is present (local-cluster launches executor JVMs through it);
  * `SPARK_GRAFT_SKIP_CLUSTER_SMOKE=1` opts out for constrained hosts. */
class ClusterSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("local-cluster[2,2] smoke: dialect, nearDuplicates, bpe encode, " +
      "both triangle shapes, routed sampled serve, stateful stream " +
      "with checkpoint recovery") {
    assume(sys.env.get("SPARK_GRAFT_SKIP_CLUSTER_SMOKE").isEmpty,
      "opted out via SPARK_GRAFT_SKIP_CLUSTER_SMOKE")
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    assume(new java.io.File(sparkHome, "sbin").exists,
      s"no Spark deployment at $sparkHome for local-cluster executors")

    val H = 3600L * 1000000000L
    val base = SparkTestBase.tempDir("graft-cluster-smoke")

    // fixtures on shared disk; expectations from the local session
    val docsPath = base + "/docs"
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200).write.parquet(docsPath)
    val docs = spark.read.parquet(docsPath)
    val expNd = graft.pipeline.Dedup.nearDuplicates(docs, "doc_id",
      "text", threshold = 0.8).count()

    // a deterministic graph with genuine triangles (~1/3 edge density)
    val edgesPath = base + "/edges"
    (for { a <- 0L until 30L; b <- 0L until 30L
           if a < b && (a * 13 + b * 7) % 3 == 0 } yield (a, b))
      .toDF("src", "dst").write.parquet(edgesPath)
    val edges = spark.read.parquet(edgesPath)
    val expTri = graft.operators.GraphOps.triangles(edges)
      .head().getLong(2)
    assert(expTri > 0, "fixture must contain triangles")

    val storePath = base + "/store"
    val samplePath = base + "/sample"
    val ev = (0L until 400L).map(i =>
      (i, (i % 4) * H, ((i % 7) + 1).toDouble + 0.25))
      .toDF("event_id", "ts", "value")
    graft.storage.RollupStore.write(ev, storePath, H)
    graft.storage.SampleStore.build(ev, samplePath, idCol = "event_id",
      bits = 1)
    val expRoute = graft.storage.RollupStore.routeSampled(spark,
        storePath, samplePath, 0L, 2 * H, 120)
      .agg(sum("n_sample")).head().getLong(0)

    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Dio.netty.tryReflectionSetAccessible=true",
      "-Dspark.ui.enabled=false", "-Xmx3g",
      "-cp", sys.props("java.class.path"),
      "graft.ClusterSmoke", docsPath, edgesPath, storePath, samplePath,
      expNd.toString, expTri.toString, expRoute.toString))
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", sparkHome)
    // the in-process worker launches executor JVMs through the
    // launcher library, which outside Spark's shell scripts (no
    // load-spark-env.sh) cannot infer the distribution's Scala version
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val finished = proc.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) proc.destroyForcibly()
    assert(finished, "cluster smoke timed out:\n" + out.takeRight(4000))
    assert(proc.exitValue() == 0,
      s"cluster smoke exit ${proc.exitValue()}:\n" + out.takeRight(6000))
    for (step <- Seq("dialect_query", "near_duplicates",
        "bpe_rank_encode", "triangles_fallback_shape",
        "triangles_spill_shape", "routed_sampled_serve",
        "streaming_state"))
      assert(out.contains(s"[cluster-smoke] PASS $step"),
        s"missing $step:\n" + out.takeRight(6000))
    assert(out.contains("[cluster-smoke] ALL PASS"))
  }
}
