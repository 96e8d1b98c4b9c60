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

  test("budget routing over the wire: a maxPoints frame serves the " +
      "tiered store with grain_ns/source, key predicate pushed, and a " +
      "malformed frame errors without killing the connection") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val H = 3600L * 1000000000L
    val Day = 86400L * 1000000000L
    val base = SparkTestBase.tempDir("graft-srv-route")
    val rawP = base + "/raw"
    val stP = base + "/store"
    Seq((1L * H, 10.25, "web"), (2L * H, 3.10, "db"),
      (25L * H, 7.77, "web"), (26L * H, 100.01, "db"),
      (49L * H, 0.02, "web"), (50L * H, 5.55, "db"))
      .toDF("ts", "value", "host").write.parquet(rawP)
    graft.storage.RollupStore.tierOff(spark, rawP, stP, cutoff = Day,
      bucketNanos = H, keyCols = Seq("host"))
    val srv = new QueryServer(new Engine(spark, dbDir))
    val port = srv.start()
    try {
      val resp = roundtrip(port,
        s"""{"maxPoints": 3, "since": 0, "until": ${3 * Day}, """ +
          s""""store": "$stP", "raw": "$rawP"}""")
      assert(resp.startsWith("""{"ok":true,"""), resp)
      assert(resp.contains("\"grain_ns\"") && resp.contains("\"source\""),
        resp)
      assert(resp.contains("stitched"), resp) // tiered: must stitch
      assert(resp.contains("\"web\"") && resp.contains("\"db\""), resp)
      // one series, zoomed: the key predicate prunes before the stitch
      val one = roundtrip(port,
        s"""{"maxPoints": 3, "since": 0, "until": ${3 * Day}, """ +
          s""""store": "$stP", "raw": "$rawP", "where": "host = 'db'"}""")
      assert(one.startsWith("""{"ok":true,"""), one)
      assert(one.contains("\"db\"") && !one.contains("\"web\""), one)
      // a value-column predicate is rejected loudly, connection survives
      val bad = roundtrip(port,
        s"""{"maxPoints": 3, "since": 0, "until": ${3 * Day}, """ +
          s""""store": "$stP", "raw": "$rawP", "where": "sum_c > 5"}""")
      assert(bad.startsWith("""{"ok":false,"""), bad)
      assert(bad.contains("non-key column"), bad)
      val missing = roundtrip(port, """{"maxPoints": 3}""")
      assert(missing.startsWith("""{"ok":false,"""), missing)
      // the dialect surface still answers on the same connection/port
      val still = roundtrip(port,
        "with format_datetime = false select * from m where ts >= '2022-01-01'")
      assert(still.startsWith("""{"ok":true,"""), still)
    } finally srv.stop()
  }

  test("AQP routing over the wire: a sample frame's fine zoom answers " +
      "from the sample store with rate_den and the variance bar riding " +
      "the columns; sample+raw is rejected loudly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val H = 3600L * 1000000000L
    val base = SparkTestBase.tempDir("graft-srv-aqp")
    val stP = base + "/store"
    val smP = base + "/sample"
    val ev = (0L until 200L).map(i =>
      (i, (i % 4) * H, ((i % 7) + 1).toDouble + 0.25))
      .toDF("event_id", "ts", "value")
    graft.storage.RollupStore.write(ev, stP, H)
    graft.storage.SampleStore.build(ev, smP, idCol = "event_id",
      bits = 1)
    val srv = new QueryServer(new Engine(spark, dbDir))
    val port = srv.start()
    try {
      // 120-point budget over 2h -> minute grain < stored 1h: the
      // sample answers, the error columns arrive over the wire
      val resp = roundtrip(port,
        s"""{"maxPoints": 120, "since": 0, "until": ${2 * H}, """ +
          s""""store": "$stP", "sample": "$smP"}""")
      assert(resp.startsWith("""{"ok":true,"""), resp)
      assert(resp.contains("\"est_var_cents2\"") &&
        resp.contains("\"rate_den\"") &&
        resp.contains("\"n_sample\""), resp)
      assert(resp.contains("\"sample\""), resp)
      // coarse budget: the exact store answers on the SAME frame shape
      val coarse = roundtrip(port,
        s"""{"maxPoints": 2, "since": 0, "until": ${4 * H}, """ +
          s""""store": "$stP", "sample": "$smP"}""")
      assert(coarse.startsWith("""{"ok":true,"""), coarse)
      assert(coarse.contains("\"store\""), coarse)
      // sample + raw is a contradiction — loud, connection survives
      val bad = roundtrip(port,
        s"""{"maxPoints": 2, "since": 0, "until": ${4 * H}, """ +
          s""""store": "$stP", "sample": "$smP", "raw": "$stP"}""")
      assert(bad.startsWith("""{"ok":false,"""), bad)
      assert(bad.contains("sample"), bad)
      // "pin": true opts into the server's PREPARED router — same
      // answer as the cold frame (rows compared as a keyed map; the
      // aggregate emits no inter-row order), served from the one-open
      // lifecycle across repeated frames
      def rows(resp: String): Map[Long, (Long, Long)] = {
        def longs(f: String): Seq[Long] =
          (s""""$f":\\[([^\\]]*)\\]""".r.findFirstMatchIn(resp).get
            .group(1)).split(",").map(_.trim.toLong).toSeq
        longs("bucket_ts").lazyZip(longs("n_sample"))
          .lazyZip(longs("est_sum_cents"))
          .map((b, n, s) => b -> ((n, s))).toMap
      }
      val resp0 = roundtrip(port,
        s"""{"maxPoints": 120, "since": 0, "until": ${2 * H}, """ +
          s""""store": "$stP", "sample": "$smP"}""")
      val pinned1 = roundtrip(port,
        s"""{"maxPoints": 120, "since": 0, "until": ${2 * H}, """ +
          s""""store": "$stP", "sample": "$smP", "pin": true}""")
      val pinned2 = roundtrip(port,
        s"""{"maxPoints": 120, "since": 0, "until": ${2 * H}, """ +
          s""""store": "$stP", "sample": "$smP", "pin": true}""")
      assert(pinned1.startsWith("""{"ok":true,"""), pinned1)
      assert(rows(pinned1) == rows(resp0),
        s"$pinned1 vs $resp0")
      assert(rows(pinned2) == rows(resp0))
      // a typo'd valueCol fails AT PREPARE, loudly, without pinning
      val typo = roundtrip(port,
        s"""{"maxPoints": 120, "since": 0, "until": ${2 * H}, """ +
          s""""store": "$stP", "sample": "$smP", "pin": true, """ +
          """"valueCol": "vlaue"}""")
      assert(typo.startsWith("""{"ok":false,"""), typo)
      assert(typo.contains("vlaue"), typo)
      // the refresh contract: append to the sample store → the pinned
      // frame still serves the open-time snapshot (the documented
      // trade) → a "refresh": true frame closes and re-prepares the
      // pair → the new rows are served, no server restart
      val more = (200L until 400L).map(i =>
        (i, (i % 4) * H, ((i % 7) + 1).toDouble + 0.25))
        .toDF("event_id", "ts", "value")
      graft.storage.SampleStore.append(more, smP, batchKey = "b2",
        idCol = "event_id", bits = 1)
      val stale = roundtrip(port,
        s"""{"maxPoints": 120, "since": 0, "until": ${2 * H}, """ +
          s""""store": "$stP", "sample": "$smP", "pin": true}""")
      assert(rows(stale) == rows(resp0), s"$stale vs $resp0")
      val fresh = roundtrip(port,
        s"""{"maxPoints": 120, "since": 0, "until": ${2 * H}, """ +
          s""""store": "$stP", "sample": "$smP", "pin": true, """ +
          """"refresh": true}""")
      assert(fresh.startsWith("""{"ok":true,"""), fresh)
      assert(rows(fresh) != rows(resp0),
        s"refresh must surface the appended batch: $fresh vs $resp0")
      assert(rows(fresh).values.map(_._1).sum >
        rows(resp0).values.map(_._1).sum,
        s"refreshed n_sample must grow: $fresh vs $resp0")
      // and the refreshed router replaces the cached one for later
      // pinned frames
      val after = roundtrip(port,
        s"""{"maxPoints": 120, "since": 0, "until": ${2 * H}, """ +
          s""""store": "$stP", "sample": "$smP", "pin": true}""")
      assert(rows(after) == rows(fresh), s"$after vs $fresh")
    } finally srv.stop()
  }

  test("STRATIFIED sampled serve over the wire: a pinned fine zoom " +
      "returns mixed-rate HT rows in the Arrow-decoded frame; append + " +
      "refresh updates the served rates without a restart") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.server.ArrowFraming
    val Min = 60L * 1000000000L
    val H = 3600L * 1000000000L
    val base = SparkTestBase.tempDir("graft-srv-aqp-strat")
    val stP = base + "/store"
    val smP = base + "/sample"
    // two strata on disjoint minute ranges: `hot` (50 rows → bits 0,
    // keep-all, rate_den 1) lives in minutes 100-119, `cold` (350 rows
    // → largest b with 350 ≥ 30·2^b is 3, rate_den 8) in minutes 0-99 —
    // so ONE response frame carries buckets at BOTH rates and the
    // mixed-rate contract is visible over the wire, not just in-process
    def mk(lo: Long, hi: Long) = (lo until hi).map { i =>
      val hot = i < 50
      val ts = if (hot) (100 + (i % 20)) * Min else (i % 100) * Min
      (i, ts, if (hot) "hot" else "cold", ((i % 7) + 1).toDouble + 0.25)
    }.toDF("event_id", "ts", "band", "value")
    val ev = mk(0L, 400L)
    graft.storage.RollupStore.write(ev, stP, H)
    graft.storage.SampleStore.buildStratified(ev, smP,
      idCol = "event_id", stratumCol = "band", minRows = 30, maxBits = 8)
    val srv = new QueryServer(new Engine(spark, dbDir))
    val port = srv.start()
    def frame(extra: String): String =
      s"""{"maxPoints": 120, "since": 0, "until": ${2 * H}, """ +
        s""""store": "$stP", "sample": "$smP"$extra}"""
    // rows compared as a bucket-keyed map — the aggregate emits no
    // inter-row order, so string equality would flake
    def srvRows(resp: String): Map[Long, (Long, Long, Long)] = {
      def longs(f: String): Seq[Long] =
        (s""""$f":\\[([^\\]]*)\\]""".r.findFirstMatchIn(resp).get
          .group(1)).split(",").map(_.trim.toLong).toSeq
      longs("bucket_ts").lazyZip(longs("n_sample"))
        .lazyZip(longs("est_count")).lazyZip(longs("rate_den"))
        .map((b, n, c, r) => b -> ((n, c, r))).toMap
    }
    try {
      // cold (unpinned) vs pinned: same stratified answer
      val cold = roundtrip(port, frame(""))
      assert(cold.startsWith("""{"ok":true,"""), cold)
      val pinned = roundtrip(port, frame(""", "pin": true"""))
      assert(srvRows(pinned) == srvRows(cold), s"$pinned vs $cold")
      // the Arrow-decoded pinned frame: stock reader, mixed rate_den
      val sock = new Socket("127.0.0.1", port)
      val (names, rows) = try {
        val out = new PrintWriter(sock.getOutputStream, true)
        out.println(frame(""", "pin": true, "format": "arrow""""))
        val (header, bytes) = ArrowFraming.readFrame(sock.getInputStream)
        assert(header.contains("\"ok\":true"), header)
        ArrowFraming.fromIpcStream(bytes)
      } finally sock.close()
      val iRate = names.indexOf("rate_den")
      val iVar = names.indexOf("est_var_cents2")
      val iN = names.indexOf("n_sample")
      val iCount = names.indexOf("est_count")
      val iBucket = names.indexOf("bucket_ts")
      assert(iRate >= 0 && iVar >= 0, names.mkString(","))
      val rates = rows.map(_(iRate).asInstanceOf[Long]).toSet
      assert(rates == Set(1L, 8L),
        s"expected mixed per-bucket rates over the wire, got $rates")
      // keep-all buckets hold no sampling randomness: variance EXACTLY
      // zero; thinned buckets carry a positive bar
      assert(rows.filter(_(iRate) == 1L).forall(_(iVar) == 0L))
      assert(rows.filter(_(iRate) == 8L).forall(
        _(iVar).asInstanceOf[Long] > 0L))
      // brute-force HT twin over the deterministic membership: hot rows
      // all kept (rate 1), cold rows kept iff the first 3 md5 bits are
      // zero (rate 8) — per-minute est_count must match exactly
      def keptCold(lo: Long, hi: Long) = (lo until hi)
        .filter { i =>
          java.lang.Long.parseLong(
            SparkTestBase.md5hex(i.toString).substring(0, 8), 16) <
            (1L << 29)
        }
      val expected = ((0L until 50L).map(i => ((100 + (i % 20)) * Min, 1L))
        ++ keptCold(50L, 400L).map(i => ((i % 100) * Min, 8L)))
        .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
      val got = rows.map(r => r(iBucket).asInstanceOf[Long] ->
        r(iCount).asInstanceOf[Long]).toMap
      assert(got == expected, s"$got vs $expected")
      // append under the FROZEN rate map → pinned frame serves the
      // open-time snapshot → refresh re-prepares and serves the growth
      graft.storage.SampleStore.appendStratified(mk(400L, 800L), smP,
        batchKey = "b2", idCol = "event_id")
      val stale = roundtrip(port, frame(""", "pin": true"""))
      assert(srvRows(stale) == srvRows(cold), s"$stale vs $cold")
      val freshed = roundtrip(port,
        frame(""", "pin": true, "refresh": true"""))
      assert(freshed.startsWith("""{"ok":true,"""), freshed)
      def nSampleSum(resp: String): Long =
        srvRows(resp).values.map(_._1).sum
      assert(nSampleSum(freshed) > nSampleSum(cold),
        s"refresh must serve the appended batch: $freshed vs $cold")
      // the appended cold rows keep their FROZEN thinned rate: the
      // refreshed frame still mixes rate 1 and rate 8 buckets
      assert(srvRows(freshed).values.map(_._3).toSet == Set(1L, 8L),
        freshed)
      // later pinned frames serve the refreshed pair
      val after = roundtrip(port, frame(""", "pin": true"""))
      assert(srvRows(after) == srvRows(freshed), s"$after vs $freshed")
    } finally srv.stop()
  }

  test("arrow-framed responses decode to the same values") {
    import graft.server.ArrowFraming
    val srv = new QueryServer(new Engine(spark, dbDir))
    val port = srv.start()
    try {
      val sock = new Socket("127.0.0.1", port)
      try {
        val out = new PrintWriter(sock.getOutputStream, true)
        out.println("""{"query": "with format_datetime = false select * """ +
          """from m where ts >= '2022-01-01'", "format": "arrow"}""")
        val (header, bytes) = ArrowFraming.readFrame(sock.getInputStream)
        assert(header.contains("\"ok\":true"), header)
        assert(header.contains("\"rows\":5"), header)
        // the payload is a STANDARD Arrow IPC stream: decode with the stock
        // Arrow reader, no graft code in the loop
        val (names, rows) = ArrowFraming.fromIpcStream(bytes)
        assert(names == Seq("ts", "v"))
        assert(rows.map(_(1)) == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
        assert(rows.map(_(0)) ==
          (1L to 5L).map(1650000000L * 1000000000L + _))
        // an error stays one plain JSON line — no binary follows, and the
        // connection remains usable
        out.println("""{"query": "select * from m", "format": "arrow"}""")
        val (errHeader, errBytes) = ArrowFraming.readFrame(sock.getInputStream)
        assert(errHeader.contains("\"ok\":false"), errHeader)
        assert(errBytes.isEmpty)
        // meta query over the same still-open connection
        out.println("""{"query": "select * from .metrics", "format": "arrow"}""")
        val (h2, b2) = ArrowFraming.readFrame(sock.getInputStream)
        assert(h2.contains("\"ok\":true"), h2)
        val (n2, r2) = ArrowFraming.fromIpcStream(b2)
        assert(n2 == Seq("metrics") && r2.map(_(0)) == Seq("m"))
        // a RAW query line whose TEXT contains the arrow literal must stay
        // on the line protocol — never flip the client into binary mode
        out.println("""select * from m where x = '{"format": "arrow"}'""")
        val (h3, b3) = ArrowFraming.readFrame(sock.getInputStream)
        assert(h3.startsWith("{\"ok\":false"), h3)
        assert(!h3.contains("\"format\":\"arrow\"") && b3.isEmpty, h3)
      } finally sock.close()
    } finally srv.stop()
  }

  test("arrow stream flags truncation at the render cap") {
    import graft.server.ArrowFraming
    val df = spark.range(10).toDF("n")
    val (bytes, rows, truncated) = ArrowFraming.toIpcStream(df, maxRows = 3)
    assert(rows == 3 && truncated)
    assert(ArrowFraming.fromIpcStream(bytes)._2.length == 3)
    val (_, allRows, notTrunc) = ArrowFraming.toIpcStream(df, maxRows = 100)
    assert(allRows == 10 && !notTrunc)
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
