ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hailspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress).
// SPARK_JARS_DIR overrides for the Spark-upgrade canary: the fence
// placement (OptimizerFenceExpr project-field invariant) and the
// fan-out materialization behavior are Spark-version-sensitive by
// nature, so before adopting a new 4.x patch run
//   SPARK_JARS_DIR=/path/to/new-spark/jars sbt -batch \
//     "testOnly graft.PlanAuditSpec graft.PipelineSpec"
// and treat any failure as an optimizer-behavior change to audit.
unmanagedBase := file(sys.env.getOrElse("SPARK_JARS_DIR",
  "/opt/spark/jars"))
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Inherit stdio for `runMain` instead of piping through sbt's logger:
// the logger prefixes every stdout line with "[info] ", which breaks
// harnesses that parse the benchmark's one-line JSON contract.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] single-JVM runs the whole ~240-query gate fleet in one
  // heap: at 8g the old gen fills over the run and late/allocation-heavy
  // queries degrade 3-5x from GC churn; at 24g occasional mid-fleet
  // queries still spiked 3-9x over their isolated times (old-gen
  // pressure), which 48g removes — full-fleet A/B 88.2 s -> ~84 s with
  // a visibly tighter per-query distribution (the container has
  // 128 GiB). A larger code cache keeps the JIT from deoptimizing the
  // hundreds of large whole-stage-codegen classes the fleet compiles.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // ad-hoc -D flags for forked runMain (e.g. a disk-constrained scale
  // run passing -Dspark.io.compression.codec=zstd)
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))
