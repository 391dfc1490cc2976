ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "collectiontemplatesspark"
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
// Forked `runMain` output goes straight to stdout, NOT through sbt's
// logger: the logger prefixes every line with "[info] ", which breaks
// any consumer that greps for the bare JSON line Bench prints.
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
  // 24g default (r17, guide §5): the local driver+executor JVM runs
  // 32 concurrent tasks, and at 8g the allocation-heavy queries spent
  // half their GC budget on young-gen churn — interleaved A/B
  // (tools/bench_mem_* rollup in OPTIMIZATION_r17.md): gc_total
  // 5.4-5.5 s at 24g vs 10.4-12.6 s at 8g (disjoint), a25 wall
  // 6.18-6.26 vs 6.74-7.63 and p5 6.94-7.75 vs 8.23-9.98 (both
  // disjoint), no band worse. Local-mode sizing only — a cluster
  // sizes executors per §5; SPARK_DRIVER_MEM still overrides (the
  // pressure-repro harness constrains through it).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++
  // Extra JVM flags for ad-hoc experiment runs — e.g.
  // -Dspark.graft.checkpointDir=... for the reliable-checkpoint full
  // gate, or -Dspark.memory.fraction=0.08 for the r11 spill repro.
  // (tools/pressure_repro.sh itself constrains via SPARK_DRIVER_MEM,
  // not this hook.) Flags are whitespace-split: no spaces inside one.
  sys.env.get("GRAFT_JAVA_OPTS").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))
