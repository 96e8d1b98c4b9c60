package graft.server

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** End-to-end Spark Connect: start the gRPC endpoint on the test context,
  * then drive it with the STOCK Spark Connect JVM client — from a child
  * process, because the client is a fat jar bundling its own
  * `org.apache.spark.sql` classes that must not share a classpath with
  * classic Spark. A passing roundtrip proves a stock `sc://` client can
  * query graft tables and native functions with no graft code installed
  * client-side.
  */
class ConnectSpec extends AnyFunSuite {

  private val clientJar = {
    val dir = new java.io.File("/opt/spark/jars/connect-repl")
    Option(dir.listFiles())
      .flatMap(_.find(_.getName.startsWith("spark-connect-client-jvm")))
  }
  // the client fat jar bundles its own sql/connect/grpc/arrow classes but
  // not scala-library or the shared spark-common-utils exception types —
  // pull just those from the distribution
  private val supportJars = {
    val dir = new java.io.File("/opt/spark/jars")
    Option(dir.listFiles()).map(_.filter(f =>
      f.getName.startsWith("scala-library-") ||
        f.getName.startsWith("scala-reflect-") ||
        f.getName.startsWith("spark-common-utils") ||
        f.getName.startsWith("spark-sql-api") ||
        f.getName.startsWith("spark-unsafe") ||
        f.getName.startsWith("kryo") ||
        f.getName.startsWith("paranamer") ||
        f.getName.startsWith("icu4j") ||
        f.getName.startsWith("json4s-") ||
        f.getName.startsWith("jackson-") ||
        f.getName.startsWith("log4j-") ||
        f.getName.startsWith("slf4j-api")).toSeq).getOrElse(Nil)
  }

  private def run(cmd: Seq[String]): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    (code, out)
  }

  test("stock Spark Connect client queries graft views and native functions") {
    assume(clientJar.isDefined && supportJars.nonEmpty,
      "spark-connect client jar not present")
    val spark = SparkTestBase.spark
    // static-conf injection point for sessions the connect service builds:
    // extensions + port are read from the context conf at session/service
    // start, so set them before the service comes up
    val liveConf = org.apache.spark.SparkEnv.get.conf
    liveConf.set("spark.sql.extensions", "graft.GraftExtensions")
    liveConf.set("spark.connect.grpc.binding.port", "15999")
    ConnectServe.start(spark, "/root/testdata/sf0.001")
    try {
      val work = java.nio.file.Files.createTempDirectory("graft-connect-probe")
      val src = work.resolve("GraftConnectProbe.java")
      java.nio.file.Files.writeString(src,
        """import org.apache.spark.sql.Row;
          |import org.apache.spark.sql.connect.SparkSession;
          |public class GraftConnectProbe {
          |  public static void main(String[] args) throws Exception {
          |    SparkSession s = SparkSession.builder().remote(args[0]).create();
          |    for (Row r : (Row[]) s.sql(args[1]).collect())
          |      System.out.println("ROW:" + r.mkString("|"));
          |    s.close();
          |  }
          |}
          |""".stripMargin)
      val cp = (clientJar.get +: supportJars).mkString(":")
      val (cc, cout) = run(Seq("javac", "-cp", cp, src.toString))
      assert(cc == 0, s"javac failed:\n$cout")
      def probe(sql: String): String = {
        val (rc, out) = run(Seq("java",
          "--add-opens=java.base/java.nio=ALL-UNNAMED", "-cp", s"$work:$cp",
          "GraftConnectProbe", "sc://localhost:15999", sql))
        assert(rc == 0, s"client failed for [$sql]:\n$out")
        out
      }
      // a graft metrics table served as a global temp view
      val viewOut = probe("SELECT count(*) AS n FROM global_temp.events")
      assert(viewOut.contains("ROW:1000"), viewOut)
      // a graft NATIVE expression resolving inside the connect session
      val fnOut = probe("SELECT format_ns(1700000000000000000) AS t")
      assert(fnOut.contains("2023-11-14T22:13:20"), fnOut)
      // the serving ROUTER as a table function over gRPC: a stock client
      // asks for a budget-routed range over a tiered store and sees the
      // stitched answer with its source label — the dashboard contract
      // with zero graft code client-side
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      val H = 3600L * 1000000000L
      val Day = 86400L * 1000000000L
      val base = graft.SparkTestBase.tempDir("graft-connect-route")
      val rawP = base + "/raw"
      val stP = base + "/store"
      Seq((1L * H, 10.25), (25L * H, 7.77), (49L * H, 0.02))
        .toDF("ts", "value").write.parquet(rawP)
      graft.storage.RollupStore.tierOff(spark, rawP, stP, cutoff = Day,
        bucketNanos = H)
      val routeOut = probe(
        s"SELECT source, grain_ns, n FROM graft_route('$stP', '$rawP', " +
          s"0, ${3 * Day}, 3) ORDER BY bucket_ts")
      assert(routeOut.contains("stitched"), routeOut)
      assert(routeOut.contains(s"$Day"), routeOut) // day-grain clamp
    } finally {
      ConnectServe.stop()
      // the shared session outlives this suite: undo the conf mutations
      // and the global temp views so later suites see the same world
      // regardless of execution order (the extensions injection itself
      // only affects future newSession() derivations and is idempotent)
      liveConf.remove("spark.sql.extensions")
      liveConf.remove("spark.connect.grpc.binding.port")
      graft.storage.Tables.listMetrics("/root/testdata/sf0.001")
        .foreach(spark.catalog.dropGlobalTempView)
    }
  }
}
