package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.ql.Engine
import graft.server.QueryServer
import graft.storage.{DataPoint, WritableStore}

class ServerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val dbDir: String = {
    val dir = SparkTestBase.tempDir("graft-srv-db")
    val store = new WritableStore(spark, dir, "m",
      Seq(StructField("v", DoubleType)))
    store.pushMulti((1L to 5L).map(i =>
      DataPoint(1650000000L * 1000000000L + i, Seq(i.toDouble))))
    store.persist()
    dir
  }

  private def roundtrip(port: Int, line: String): String = {
    val sock = new Socket("127.0.0.1", port)
    try {
      val out = new PrintWriter(sock.getOutputStream, true)
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream))
      out.println(line)
      in.readLine()
    } finally sock.close()
  }

  test("server answers queries over TCP, raw and JSON-framed") {
    val srv = new QueryServer(new Engine(spark, dbDir))
    val port = srv.start()
    try {
      val raw = roundtrip(port,
        "with format_datetime = false select * from m where ts >= '2022-01-01'")
      assert(raw.startsWith("""{"ok":true,"""))
      assert(raw.contains(""""v":[1.0,2.0,3.0,4.0,5.0]"""))
      val framed = roundtrip(port,
        """{"query": "select * from .metrics"}""")
      assert(framed.contains("\"m\""))
      val err = roundtrip(port, "select * from m")
      assert(err.startsWith("""{"ok":false,"""))
      assert(err.contains("EmptyFilterCondition"))
      val parseErr = roundtrip(port, "not a query")
      assert(parseErr.startsWith("""{"ok":false,"""))
    } finally srv.stop()
  }

  test("concurrent clients get independent answers") {
    val srv = new QueryServer(new Engine(spark, dbDir))
    val port = srv.start()
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val results = Await.result(
        Future.sequence((1 to 4).map(_ => Future(roundtrip(port,
          "with format_datetime = false select * from m where ts <=|2 '2023-01-01'")))),
        60.seconds)
      assert(results.forall(_.startsWith("""{"ok":true""")))
    } finally srv.stop()
  }
}
