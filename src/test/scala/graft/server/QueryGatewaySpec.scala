package graft.server

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket

import graft.{SparkSpec, Tables}

class QueryGatewaySpec extends SparkSpec {

  private def connect(port: Int): (Socket, PrintWriter, BufferedReader) = {
    val s = new Socket("localhost", port)
    (s, new PrintWriter(s.getOutputStream, true),
      new BufferedReader(new InputStreamReader(s.getInputStream)))
  }

  test("gateway executes SQL and streams JSON rows per connection") {
    val gw = new QueryGateway(spark, s => Tables.register(s, sfDir))
    try {
      val (sock, out, in) = connect(gw.boundPort)
      out.println("SELECT count(*) AS n FROM lineitem")
      val head = in.readLine()
      assert(head == "ok 1", head)
      assert(in.readLine().contains("\"n\":"))
      // errors are reported inline, connection survives
      out.println("SELECT * FROM nonexistent_table")
      assert(in.readLine().startsWith("error "))
      out.println("SELECT r_name FROM region ORDER BY r_name LIMIT 1")
      assert(in.readLine() == "ok 1")
      assert(in.readLine().contains("r_name"))
      out.println("quit")
      sock.close()
    } finally gw.close()
  }

  test("connections are catalog-isolated but share the SparkContext") {
    val gw = new QueryGateway(spark, _ => ())
    try {
      val (s1, o1, i1) = connect(gw.boundPort)
      val (s2, o2, i2) = connect(gw.boundPort)
      o1.println("CREATE TEMPORARY VIEW mine AS SELECT 42 AS x")
      assert(i1.readLine().startsWith("ok"))
      o1.println("SELECT x FROM mine")
      assert(i1.readLine() == "ok 1"); i1.readLine()
      // the other connection must NOT see the temp view
      o2.println("SELECT x FROM mine")
      assert(i2.readLine().startsWith("error "))
      s1.close(); s2.close()
    } finally gw.close()
  }

  test("concurrent clients both complete (FAIR pools)") {
    val gw = new QueryGateway(spark, s => Tables.register(s, sfDir))
    try {
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.global
      val results = Await.result(Future.sequence((1 to 4).map { _ =>
        Future {
          val (sock, out, in) = connect(gw.boundPort)
          out.println("SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1")
          val head = in.readLine()
          val rows = (1 to head.split(" ")(1).toInt).map(_ => in.readLine()).toList
          sock.close()
          (head, rows.size)
        }
      }), 5.minutes).toList
      assert(results.forall { case (h, n) => h.startsWith("ok") && n > 0 })
      assert(results.map(_._2).distinct.size == 1)
    } finally gw.close()
  }

  test("Thrift JDBC front-end answers a query end-to-end") {
    // JDBC connections get their own Spark session: temp views don't cross,
    // catalog (persistent) views do — register the corpus as catalog views.
    spark.sql(s"CREATE OR REPLACE VIEW lineitem_v AS SELECT * FROM parquet.`$sfDir/lineitem.parquet`")
    val port = 10000 + scala.util.Random.nextInt(5000)
    val server = ThriftFrontend.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      var conn: java.sql.Connection = null
      val deadline = System.currentTimeMillis() + 60000
      while (conn == null && System.currentTimeMillis() < deadline) {
        try conn = java.sql.DriverManager.getConnection(
          s"jdbc:hive2://localhost:$port/default", "", "")
        catch { case _: Throwable => Thread.sleep(1000) }
      }
      assert(conn != null, "could not connect to Thrift server")
      val rs = conn.createStatement().executeQuery(
        "SELECT count(*) AS n FROM lineitem_v")
      assert(rs.next())
      assert(rs.getLong(1) > 0)
      conn.close()
    } finally server.stop()
  }
}
