ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "yjschemavalidatorspark"
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
run / connectInput := true // stdin reaches the forked CLI (S2 entry)
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
  // local mode = driver-only: give the single JVM most of the machine
  // (128 GiB box); string-heavy span synthesis is GC-bound on small heaps
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // 43 consecutive queries compile a LOT of whole-stage-codegen classes;
  // once the JIT code cache fills, compilation stops and late queries run
  // interpreted (measured: v_json_schema 4.7 s isolated vs 230 s late in
  // the bench sequence). Default 240 MB is far too small for this run.
  "-XX:ReservedCodeCacheSize=2g",
  // InferFiltersFromGenerate infers `size(g) > 0` from explode(g) and
  // predicate pushdown then INLINES the generator's whole defining
  // expression into a scan-level filter — for a computed generator input
  // (a compiled schema's violations array) the entire schema evaluation
  // runs 2-3x per row (measured: explode(violations) 4.9 s vs 0.7 s at
  // sf0.1, Probe11f/g). The rule only helps when the generator input is a
  // stored column; for this engine's compute-then-explode shape it is a
  // pure pessimization, at 100 TB a catastrophic one.
  "-Dspark.sql.optimizer.excludedRules=" +
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
)
