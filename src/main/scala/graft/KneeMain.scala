package graft

/** Records the scaling-knee attribution as a driver-verifiable artifact
  * (KNEE.json).
  *
  * The north-rule efficiency bar is measured at 1-vs-4 cores because all
  * local cores share ONE memory controller — separate cluster nodes do
  * not — and the bus saturates between 4 and 8 local cores. That claim
  * ("the knee is the sandbox's bus, not the engine") is load-bearing, so
  * this main pins it with one recorded run of two independent series at
  * 1/2/4/8 cores:
  *
  *  1. the SAME deterministic crawl job's HOT-STAGE task-time inflation
  *     (total executorRunTime of the fetch+parse+write stage — identical
  *     work at every core count, so more task-ms = per-core slowdown
  *     from resource sharing, not scheduling or skew), captured by a
  *     SparkListener inside each forked rep (CrawlRepMain
  *     GRAFT_STAGE_STATS);
  *  2. the no-Spark fetchParse COMPUTE kernel's CPU-time inflation
  *     (graft.RawBench: sec × threads for fixed total work);
  *  3. the no-Spark memory-BANDWIDTH probe's inflation (graft.MemBench:
  *     fixed per-thread streaming work, so wall-clock growth = bus
  *     contention and nothing else).
  *
  * The attribution this pins: if the crawl's task-time inflation at 8
  * cores tracks the bandwidth probe (3) and NOT the compute kernel (2),
  * the saturating resource is the shared memory subsystem — which the
  * byte-heavy stages (parquet encode, shuffle, tmpfs writes) hit and the
  * pure kernel does not — and separate cluster nodes do not share. The
  * JSON also records the coordination residual: wall-clock loss NOT
  * explained by task inflation (scheduling, barriers, stragglers — the
  * part that IS the engine's responsibility at any scale). Every fork
  * runs with `-XX:ActiveProcessorCount=c` (honest c-core nodes, same as
  * the bench reps) and a fresh heap.
  *
  * Env knobs: GRAFT_KNEE_ENTITIES (default 500000, the bench world),
  * GRAFT_KNEE_REPS (default 2; min over reps per core count),
  * GRAFT_KNEE_CORES (default "1,2,4,8").
  */
object KneeMain {

  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def fork(cpus: Int, main: String, args: Seq[String],
                   env: Map[String, String]): String = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cmd: Seq[String] = Seq(java) ++ Bench.addOpens ++ Seq(
      "-Xmx" + sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"),
      "-XX:+UseParallelGC",
      s"-XX:ActiveProcessorCount=$cpus",
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      main) ++ args
    val pb = new ProcessBuilder(cmd: _*)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    val rc = proc.waitFor()
    if (rc != 0) sys.error(s"fork $main@$cpus exited $rc:\n$out")
    out
  }

  private val StageRe =
    """\{"stage":(\d+),"name":"([^"]*)","taskMs":(\d+),"tasks":(\d+)\}""".r

  /** One crawl rep at `cpus`: (urls, wallSec, taskMs by stage NAME).
    * Aggregating by name (not id) lets the hot stage be matched across
    * core counts, where stage ids differ. */
  private def crawlRep(cpus: Int, nEntities: Long)
      : (Long, Double, Map[String, Long]) = {
    val out = fork(cpus, "graft.CrawlRepMain",
      Seq(cpus.toString, nEntities.toString, "4000"),
      Map("GRAFT_STAGE_STATS" -> "1"))
    val repLine = out.linesIterator.find(_.startsWith("CRAWLREP")).getOrElse(
      sys.error(s"no CRAWLREP line:\n$out"))
    val kv = repLine.split("\\s+").drop(1)
      .map(_.split("=")).map(a => a(0) -> a(1)).toMap
    val stagesLine = out.linesIterator.find(_.startsWith("CRAWLSTAGES"))
      .getOrElse(sys.error(s"no CRAWLSTAGES line:\n$out"))
    val byName = StageRe.findAllMatchIn(stagesLine)
      .map(m => (m.group(2), m.group(3).toLong)).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    (kv("urls").toLong, kv("sec").toDouble, byName)
  }

  /** Min seconds for `threads` over a warm fork (plan "c,c": the first
    * run absorbs JIT, the repeat measures; min-of-both is safe —
    * contention only slows). Shared by the compute kernel (RawBench) and
    * the bandwidth probe (MemBench), which print the same line shape. */
  private def noSparkRep(cpus: Int, main: String, tag: String,
                         extraEnv: Map[String, String]): Double = {
    val out = fork(cpus, main, Seq.empty,
      Map("THREADS" -> s"$cpus,$cpus") ++ extraEnv)
    val secs = out.linesIterator
      .filter(_.startsWith(tag))
      .map(_.split("sec=")(1).trim.toDouble).toSeq
    if (secs.isEmpty) sys.error(s"no $tag line:\n$out")
    secs.min
  }
  /** Kernel units default 100k (~25 s single-threaded): the 40k first cut
    * gave a ~1.1-1.5 s 8-thread measurement — short enough that one
    * scheduling hiccup flips the series (observed bimodal across runs).
    * GRAFT_KNEE_RAW_N overrides. */
  private def rawRep(cpus: Int): Double =
    noSparkRep(cpus, "graft.RawBench", "RAWBENCH",
      Map("N" -> sys.env.getOrElse("GRAFT_KNEE_RAW_N", "100000")))
  private def memRep(cpus: Int): Double =
    noSparkRep(cpus, "graft.MemBench", "MEMBENCH", Map.empty)

  def main(args: Array[String]): Unit = {
    val nEntities = sys.env.getOrElse("GRAFT_KNEE_ENTITIES", "500000").toLong
    val reps = sys.env.getOrElse("GRAFT_KNEE_REPS", "2").toInt
    val cores = sys.env.getOrElse("GRAFT_KNEE_CORES", "1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq

    // interleave core counts across rounds (the Bench lesson: a contended
    // machine window must not eat one core count's whole sample budget)
    var urls = 0L
    val crawlSec = collection.mutable.Map.empty[Int, Double]
    val crawlStages = collection.mutable.Map.empty[Int, Map[String, Long]]
    (1 to reps).foreach { r =>
      cores.foreach { c =>
        val (u, sec, byName) = crawlRep(c, nEntities)
        urls = u
        System.err.println(s"[knee] crawl c=$c rep$r sec=${num(sec)}")
        if (!crawlSec.contains(c) || sec < crawlSec(c)) {
          crawlSec(c) = sec
          crawlStages(c) = byName
        }
      }
    }
    val rawSec = cores.map(c => c -> rawRep(c)).toMap
    cores.foreach(c => System.err.println(s"[knee] raw c=$c sec=${num(rawSec(c))}"))
    val memSec = cores.map(c => c -> memRep(c)).toMap
    cores.foreach(c => System.err.println(s"[knee] mem c=$c sec=${num(memSec(c))}"))

    // hot stage = largest task-time at the base core count, matched by
    // name elsewhere; total task-time feeds the decomposition
    val base = cores.min
    val (hotName, _) = crawlStages(base).maxBy(_._2)
    def hotMs(c: Int): Long = crawlStages(c).getOrElse(hotName, 0L)
    def totalMs(c: Int): Long = crawlStages(c).values.sum
    def series(f: Int => Double): String =
      cores.map(c => s""""$c":${num(f(c))}""").mkString("{", ",", "}")
    def pairEff(a: Int, b: Int): Double =
      (crawlSec(a) / crawlSec(b)) / (b.toDouble / a)
    val pairs = cores.sliding(2).collect { case Seq(a, b) =>
      s""""${a}v$b":${num(pairEff(a, b))}""" }.mkString(",")
    // skip the explicit 1v4 suffix when sliding(2) already emitted that
    // pair (cores == 1,4 adjacent) — duplicate JSON keys otherwise
    val oneVfour = if (cores.contains(1) && cores.contains(4) &&
        !cores.sliding(2).toSeq.contains(Seq(1, 4)))
      s""","1v4":${num(pairEff(1, 4))}""" else ""
    // coordination residual: actual wall vs the wall predicted by task
    // inflation alone (sec_base × base / c × inflation) — >1.0 means
    // wall-clock loss NOT explained by tasks running slower, i.e.
    // scheduling / barrier / straggler loss, the part that is the
    // ENGINE's to own. The × base factor matters when the base core
    // count is not 1 (GRAFT_KNEE_CORES="2,4,8"): predicted wall at c
    // cores starts from base's per-core work sec_base × base.
    def coord(c: Int): Double =
      crawlSec(c) * c /
        (crawlSec(base) * base * (totalMs(c).toDouble / totalMs(base)))

    val json =
      s"""{
         |  "timestamp": "${java.time.Instant.now}",
         |  "entities": $nEntities,
         |  "urls": $urls,
         |  "cores": [${cores.mkString(",")}],
         |  "reps_per_core": $reps,
         |  "crawl": {
         |    "wall_sec": ${series(crawlSec(_))},
         |    "pair_efficiency": {$pairs$oneVfour},
         |    "hot_stage": {
         |      "name": "${hotName.replace("\"", "'")}",
         |      "task_ms": ${cores.map(c => s""""$c":${hotMs(c)}""").mkString("{", ",", "}")},
         |      "inflation_vs_${base}core": ${series(c => hotMs(c).toDouble / hotMs(base))}
         |    },
         |    "total_task_ms": ${cores.map(c => s""""$c":${totalMs(c)}""").mkString("{", ",", "}")},
         |    "total_task_inflation_vs_${base}core": ${series(c => totalMs(c).toDouble / totalMs(base))},
         |    "coordination_residual_vs_${base}core": ${series(coord)}
         |  },
         |  "rawbench_compute_no_spark": {
         |    "units": ${sys.env.getOrElse("GRAFT_KNEE_RAW_N", "100000")},
         |    "wall_sec": ${series(rawSec(_))},
         |    "cpu_time_inflation_vs_${base}core": ${series(c => rawSec(c) * c / (rawSec(base) * base))}
         |  },
         |  "membench_bandwidth_no_spark": {
         |    "per_thread_mb": 256,
         |    "wall_sec": ${series(memSec(_))},
         |    "inflation_vs_${base}core": ${series(c => memSec(c) / memSec(base))}
         |  },
         |  "reading": "All series are IDENTICAL work per measurement, relative to the ${base}-core fork. crawl.total_task_inflation = how much slower the same tasks run when c cores share the node; coordination_residual = wall-clock loss NOT explained by that inflation (scheduling/barriers/stragglers — the engine's own overhead, the only part that follows the engine to a real cluster). rawbench_compute = the no-Spark fetchParse kernel in a plain-threads fork (allocation-heavy, like the parse path); membench_bandwidth = a no-Spark read-streaming probe (fixed per-thread work). The knee is attributed BELOW the engine when task inflation reappears in a no-Spark fork at the same core count while the coordination residual stays flat; comparing the two probes localizes WHICH shared resource saturates (allocation/write path vs sequential-read bandwidth)."
         |}""".stripMargin
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("KNEE.json"), json + "\n")
  }
}
