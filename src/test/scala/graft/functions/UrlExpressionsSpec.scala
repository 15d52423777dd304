package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class UrlExpressionsSpec extends AnyFunSuite {

  private lazy val spark = {
    // getOrCreate ignores withExtensions when another suite's session is
    // live; clear the handles so a fresh session (same context) is built
    // with our extensions installed
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("urlexpr-spec")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("native expressions match the scalar kernel bit-for-bit") {
    import spark.implicits._
    val urls = Seq(
      "HTTP://Example.COM:80/a/../b?x=1#frag",
      "https://h.example/p/1",
      "ftp://nope/x",
      "http://host3.example/p/7")
    val df = urls.toDF("url")
      .select($"url",
        UrlExpressions.url_canonicalize($"url").as("canon"),
        UrlExpressions.url_host($"url").as("host"),
        UrlExpressions.url_hash64($"url").as("h"))
    val rows = df.collect().map(r => (r.getString(0),
      Option(r.getString(1)), Option(r.getString(2)), r.getLong(3)))
    rows.foreach { case (u, canon, host, h) =>
      assert(canon == graft.core.UrlNorm.canonicalize(u), u)
      assert(host == graft.core.UrlNorm.host(u), u)
      assert(h == graft.core.UrlNorm.urlHash(u), u)
    }
  }

  test("registered for SQL via SparkSessionExtensions") {
    val r = spark.sql(
      "SELECT url_host('http://A.B/x') AS h, url_hash64('http://a.b/x') AS v, " +
        "url_canonicalize('HTTP://A.B:80/./x') AS c").collect()(0)
    assert(r.getString(0) == "a.b")
    assert(r.getLong(1) == graft.core.UrlNorm.urlHash("http://a.b/x"))
    assert(r.getString(2) == "http://a.b/x")
  }

  test("expressions run inside whole-stage codegen (no fallback)") {
    import spark.implicits._
    val df = spark.range(1000)
      .select(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("http://h"),
        ($"id" % 64).cast("string"),
        org.apache.spark.sql.functions.lit(".example/p/"),
        $"id".cast("string")).as("url"))
      .select(UrlExpressions.url_hash64($"url").as("h"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") ||
      "\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined, plan.take(800))
    assert(df.distinct().count() == 1000) // hashes are distinct & non-null
  }
}
