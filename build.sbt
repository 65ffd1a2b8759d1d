ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dbticebreakerspark"
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
// Forked `run` output must reach stdout RAW: sbt's default logger
// prefixes every line with "[info] ", which breaks the bench driver's
// single-JSON-line contract (BENCH_r01/r02 recorded parsed:null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs module opens when SparkSession is created
// outside spark-submit (which normally injects them). The package list
// is shared with tools/run.sh (the sbt-free launcher, which also
// mirrors this build's classpath: /opt/spark/jars + compiled classes)
// via tools/jdk17-add-opens.txt so the two launchers cannot drift.
val jdk17AddOpens = IO.readLines(file("tools/jdk17-add-opens.txt"))
  .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
  .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Pin the JVM default locale: Spark's UTF8String.toLowerCase falls
  // back to String.toLowerCase (default locale) on non-ASCII strings,
  // and e.g. a Turkish locale maps 'I' -> dotless 'ı' — which would
  // break the byte-scan kernels' asserted equivalence to their
  // lower()+regex Column specs (graft.functions.TextHash).
  "-Duser.language=en", "-Duser.country=US",
)
