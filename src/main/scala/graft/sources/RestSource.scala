package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** REST JSON ingestion (S3): the reference GETs a monthly solar
  * power-generation payload of parallel arrays and zips them into rows
  * (reference: jobs/source_to_raw/solar.py:93-134).
  *
  * The HTTP transport is a trait so tests inject canned payloads (the
  * reference patches `getDataFromWzsArmPrd` the same way). The fetch is
  * driver-side by design — the payload is one bounded monthly document, not
  * a distributed scan (SURVEY.md §2.1 S3: "custom TableProvider; not worth
  * it"); the result becomes a regular DataFrame immediately.
  */
object RestSource {

  trait Http extends Serializable {
    def get(url: String): String
  }

  object JavaHttp extends Http {
    override def get(url: String): String = {
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(30)).build()
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(30)).GET().build()
      client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    }
  }

  /** Parse `{"datetime": [...], "actual": [...], "target": [...]}` parallel
    * arrays into (datetime, actual, target) rows. */
  def solarMonthly(spark: SparkSession, http: Http, url: String): DataFrame = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(http.get(url))
    val dts = root.get("datetime").elements().asScala.map(_.asText()).toSeq
    val actual = root.get("actual").elements().asScala.map(_.asDouble()).toSeq
    val target = root.get("target").elements().asScala.map(_.asDouble()).toSeq
    val rows = dts.lazyZip(actual).lazyZip(target).map((d, a, t) => (d, a, t))
    import spark.implicits._
    rows.toDF("datetime", "actual", "target")
  }
}
