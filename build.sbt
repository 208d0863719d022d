ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "esgdecarbonizationdataintegrationanddatapiplinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Second EMBEDDED JDBC engine for the dialect-portability specs
// (JdbcSwapSpec / JdbcAggPushdownSpec run on Derby AND DuckDB): the jar is
// already present in the machine's local artifact cache, so it is picked up
// as an unmanaged TEST jar by glob — nothing is resolved or downloaded
// (zero-egress holds), and it is not a library dependency of the engine.
Test / unmanagedJars ++= {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  // Pin ONE jar: the NEWEST by parsed numeric version (a lexicographic
  // name sort ranks 0.10.x above 1.x), so multiple cached versions
  // neither land together nor pin a stale driver.
  def ver(f: File): (Int, Int, Int, Int) = {
    val ns = "\\d+".r.findAllIn(f.getName.stripPrefix("duckdb_jdbc-"))
      .map(_.toInt).toList.padTo(4, 0)
    (ns(0), ns(1), ns(2), ns(3))
  }
  val jars = (cache ** "duckdb_jdbc-*.jar").get.sortBy(ver).reverse
  if (jars.isEmpty)
    // warn, don't fail: a hard sys.error here breaks EVERY test-classpath
    // evaluation; only the DuckDB dialect suites need the jar, and they
    // fail with their own clear message when the driver class is absent.
    sLog.value.warn("duckdb_jdbc-*.jar not found in the local coursier " +
      s"cache ($cache) — the DuckDB dialect suites (JdbcSwapSpec, " +
      "JdbcAggPushdownSpec) will fail without it")
  jars.headOption.map(Attributed.blank(_)).toSeq
}
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
