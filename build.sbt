ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "oagdedupespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output goes straight to this process's stdout/stderr
// instead of through sbt's logger — keeps graft.Bench's JSON line free
// of the "[info] " prefix so the driver can parse it.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Heap policy: fixed-size, pre-touched, clamped to [2g, 12g]. Measured on
// this box: an oversized max heap (e.g. 90g) makes the first pass of
// every allocation-heavy stage 3-10x slower — the JVM grows the heap
// instead of collecting, and faulting in + zeroing tens of GB of fresh
// pages is charged to whatever stage runs first (bench round-1
// reproducibility gap). Xms=Xmx + AlwaysPreTouch moves page commit to
// JVM startup, outside any timed section.
val graftHeap = {
  val gb = sys.env.get("SPARK_DRIVER_MEM")
    .map(_.toLowerCase.stripSuffix("g"))
    .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(8)
  s"${math.min(math.max(gb, 2), 12)}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xms$graftHeap", s"-Xmx$graftHeap", "-XX:+AlwaysPreTouch",
)
