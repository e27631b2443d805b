ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mammothspark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 8g measured FASTER than 48g for the full bench on this VM (47s vs
  // 74s, same load): a huge lazily-allocated heap page-faults its way up
  // on overcommitted memory and G1 works bigger regions — don't "fix" GC
  // by inflating Xmx here
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// The driver's bench capture keeps a tail of stdout and parses its LAST
// line as JSON — but sbt always ends with its own "[success]" banner, so
// the record (printed by the forked Bench JVM, which exits first) can
// never be last. This hook runs in the SBT JVM at exit — i.e. AFTER the
// banner — and re-prints the bare compact record iff graft.Bench wrote
// it during this invocation (mtime guard: verify/test/compile sessions
// never touch the file and print nothing).
val benchRecordTail: Unit = if (sys.props.put("graft.benchTailHook", "1").isEmpty) {
  // the guard registers the hook ONCE per JVM: an interactive sbt shell
  // re-evaluates build.sbt on every `reload`, and stacked hooks would
  // print the record once per reload at exit
  val sbtStart = System.currentTimeMillis()
  java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() => {
    val f = new java.io.File("bench_summary.json")
    val owner = new java.io.File("bench_owner.pid")
    // ownership check: the forked Bench JVM records its PARENT pid (this
    // sbt JVM) in a sidecar, so a concurrent sbt session running Bench
    // can't make an unrelated invocation tail-print the record
    val owned = owner.isFile && {
      val src = scala.io.Source.fromFile(owner, "UTF-8")
      val pid = try src.mkString.trim finally src.close()
      pid == ProcessHandle.current().pid().toString
    }
    if (f.isFile && f.lastModified() >= sbtStart && owned) {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try println(src.mkString.trim) finally src.close()
      System.out.flush()
    }
  }))
}
