package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.funsuite.AnyFunSuite

/** REST serving face (S11 — ApiRuler semantics): POST text → the export
  * JSON inside the reference's {resultJson, hasError} envelope.
  */
class ServeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withServer[T](f: Int => T): T = {
    val server = Serve.start(spark, 0)
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /api/text returns the FRIES frame graph in the ApiRuler " +
       "envelope; indexcard variant; error shapes") {
    withServer { port =>
      // liveness
      val ping = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/api/ping")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(ping.statusCode() == 200 && ping.body().contains("ok"))

      // fries (default output)
      val r = post(port, "/api/text", "MEK1 phosphorylates ERK2.")
      assert(r.statusCode() == 200, r.body())
      assert(r.body().contains("\"hasError\":false"))
      assert(r.body().contains("\"requestId\":\"api"))
      assert(r.body().contains("frame-collection") &&
        r.body().contains("\"subtype\":\"phosphorylation\"") &&
        r.body().contains("event-mention"),
        r.body().take(400))

      // indexcard
      val ic = post(port, "/api/text?output=indexcard",
        "MEK1 phosphorylates ERK2.")
      assert(ic.statusCode() == 200, ic.body())
      assert(ic.body().contains("\"hasError\":false"))
      assert(ic.body().contains("interaction_type"), ic.body().take(400))

      // unknown format -> 400 with ApiRuler's error shape
      val bad = post(port, "/api/text?output=bogus", "some text")
      assert(bad.statusCode() == 400)
      assert(bad.body().contains("\"hasError\":true") &&
        bad.body().contains("unknown output format"))

      // empty body -> 400
      val empty = post(port, "/api/text", "  ")
      assert(empty.statusCode() == 400 &&
        empty.body().contains("\"hasError\":true"))

      // wrong method -> 405
      val get = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/api/text")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode() == 405)

      // the envelope's resultJson is well-formed JSON: Spark can parse it
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val parsed = Seq(r.body()).toDS().select(
        get_json_object(col("value"),
          "$.resultJson.sentences.object-type"))
        .as[String].head()
      assert(parsed == "frame-collection")
    }
  }
}
