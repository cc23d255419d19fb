package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.sources.Sources

/** S1-S5 source specs over the authored fixtures. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  val fix = SparkEntry.FixturesDir

  test("S3: multi-file JSON scan with declared schema; missing userId -> null") {
    val ev = Sources.events(spark, s"$fix/events_json")
    assert(ev.count() == 24)
    assert(ev.schema("duration").dataType == IntegerType)
    assert(ev.schema("itemPrice").dataType == StringType)
    assert(ev.filter($"userId".isNull).count() == 4)
  }

  test("S2: inferred-schema resources dim") {
    val res = Sources.resources(spark, s"$fix/resources.json")
    assert(res.count() == 6)
    assert(res.columns.toSet == Set("id", "name", "categoryId", "providerId", "promotion"))
  }

  test("S1: categories payload parsed driver-side into the declared schema") {
    val cats = Sources.categories(spark, s"$fix/categories.json")
    assert(cats.schema.fieldNames.toSeq == Seq("tenant", "id", "name", "percent"))
    val byId = cats.select("id", "percent").as[(String, String)].collect().toMap
    assert(byId == Map("3.1" -> "15", "2.2" -> "10", "7" -> "20"))
  }

  test("S1: escaped quotes and non-string nested values survive the payload parser") {
    val payload =
      """{"meta": {"nested": {"deep": [1, 2]}},
        | "content": [
        |   {"tenant": "t1", "id": "1.1", "name": "a \"quoted\" cat", "percent": "12"},
        |   {"tenant": "t1", "id": "2.2", "name": "uniçode", "percent": 7,
        |    "extra": {"ignored": true}}
        |]}""".stripMargin
    val cats = Sources.categories(spark, "inline", new graft.sources.Fetcher {
      override def fetch(location: String): String = payload
    })
    val byId = cats.select("id", "name", "percent").as[(String, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(byId("1.1")._2 == "a \"quoted\" cat")
    assert(byId("2.2")._2 == "uniçode")
    // numeric percent surfaces as its string form (all-string schema)
    assert(byId("2.2")._3 == "7")
  }

  test("S1/S5: the Fetcher seam injects — consumers never see the transport") {
    // a recording fetcher standing in for the reference's HTTP GET
    var fetched = List.empty[String]
    val viaSeam = new graft.sources.Fetcher {
      override def fetch(location: String): String = {
        fetched ::= location
        graft.sources.FileFetcher.fetch(s"$fix/${location.stripPrefix("https://api.test/")}")
      }
    }
    val cats = Sources.categories(spark, "https://api.test/categories.json", viaSeam)
    val rates = Sources.exchangeRates("https://api.test/rates.json", viaSeam)
    assert(cats.count() == 3)
    assert(rates("EUR") == 1.08)
    assert(fetched.toSet ==
      Set("https://api.test/categories.json", "https://api.test/rates.json"))
  }

  test("S4: CSV with header + inferSchema keeps PascalCase columns") {
    val ct = Sources.countries(spark, s"$fix/countries.csv")
    assert(ct.columns.toSeq == Seq("CountryCode", "Country", "Code"))
    assert(ct.count() == 5)
  }

  test("typed Dataset views round-trip the declared schemas") {
    val ev = Sources.eventsDs(spark, s"$fix/events_json")
    assert(ev.filter(_.userId.isEmpty).count() == 4)
    assert(ev.map(_.duration.getOrElse(0)).reduce(_ + _) > 0)
    val res = Sources.resourcesDs(spark, s"$fix/resources.json")
    assert(res.map(_.providerId).distinct().count() == 3)
    assert(Sources.categoriesDs(spark, s"$fix/categories.json").count() == 3)
  }

  test("S7 consumer side: users dim loads typed (written-but-never-read in the reference)") {
    val u = Sources.users(spark, s"$fix/users.json")
    assert(u.count() == 4)
    val typed = Sources.usersDs(spark, s"$fix/users.json").collect()
    assert(typed.map(_.email).toSet.contains("u2@example.com"))
    assert(typed.find(_.email == "u2@example.com").get.name == "Ben \"BJ\" Jones")
  }

  test("S5: rates map parse + broadcast") {
    val rates = Sources.exchangeRates(s"$fix/rates.json")
    assert(rates == Map("USD" -> 1.0, "EUR" -> 1.08, "GBP" -> 1.27))
    val b = Sources.broadcastRates(spark, s"$fix/rates.json")
    assert(b.value("EUR") == 1.08)
    assert(Sources.ratesDf(spark, s"$fix/rates.json").count() == 3)
  }

  test("HttpFetcher: S1/S4/S5 via a local HTTP stub equal the file-backed results") {
    import java.nio.file.{Files, Paths}
    // loopback-only stub serving the same fixture bytes over HTTP —
    // exercises the real java.net.http client without any egress
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def serve(path: String, file: String): Unit =
      server.createContext(path, exchange => {
        val bytes = Files.readAllBytes(Paths.get(s"$fix/$file"))
        exchange.sendResponseHeaders(200, bytes.length)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      })
    serve("/categories", "categories.json")
    serve("/rates", "rates.json")
    serve("/countries", "countries.csv")
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      val http = graft.sources.HttpFetcher
      assert(Sources.categories(spark, s"$base/categories", http).collect().toSet ==
        Sources.categories(spark, s"$fix/categories.json").collect().toSet)
      assert(Sources.exchangeRates(s"$base/rates", http) ==
        Sources.exchangeRates(s"$fix/rates.json"))
      assert(Sources.countriesVia(spark, s"$base/countries", http).collect().toSet ==
        Sources.countries(spark, s"$fix/countries.csv").collect().toSet)
      // non-HTTP locations fall through to the file fetcher
      assert(Sources.exchangeRates(s"$fix/rates.json", http)("EUR") == 1.08)
      // HTTP errors surface, not silently parsed
      val e = intercept[IllegalArgumentException] {
        graft.sources.HttpFetcher.fetch(s"$base/nope")
      }
      assert(e.getMessage.contains("404"))
    } finally server.stop(0)
  }

  test("defaultFetcher honors the graft.fetcher flag (file remains the default)") {
    assert(Sources.defaultFetcher eq graft.sources.FileFetcher)
    System.setProperty("graft.fetcher", "http")
    try assert(Sources.defaultFetcher eq graft.sources.HttpFetcher)
    finally System.clearProperty("graft.fetcher")
  }
}
