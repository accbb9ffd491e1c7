ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hive232spark"
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
// forward opt-in flags into the forked test JVM
// (sbt -Dgraft.slow=1 ... / sbt -Dgraft.hplsql.regen=1 ...)
javaOptions ++= Seq("graft.slow", "graft.hplsql.regen")
  .flatMap(k => sys.props.get(k).map(v => s"-D$k=$v"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  // per-session function re-registration WARNs flood the replay logs
  s"-Dlog4j.configurationFile=${baseDirectory.value}/src/test/resources/log4j2.properties",
  "-Dspark.sql.session.timeZone=UTC",
  // The reference's qtest driver runs in US/Pacific (QTestUtil sets
  // user.timezone): ORC fixture files store PST wall clocks, and the
  // golden replays (session TZ pinned to America/Los_Angeles in
  // GoldenHarness) only round-trip them when the ORC reader's JVM
  // zone matches. Engine sessions still pin session TZ to UTC above,
  // so non-golden behavior is unchanged.
  "-Duser.timezone=America/Los_Angeles",
  // the golden corpus replays ~1400 files through 6 concurrent
  // sessions in one JVM; 8g thrashes near the end of the sweep
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
)
