package graft

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scale-wall probe: times named SparkEntry queries like Bench (noop sink,
  * best-of-N) while recording the executor-memory evidence the timing alone
  * hides — per-task peak execution memory, total memory/disk spill, shuffle
  * write volume, and peak JVM heap (sampled). One JSON line per query.
  *
  * This is the round-13 instrument for "where does the first
  * executor-memory / spill wall sit": exponents measured at sf0.1 → sf1 →
  * sf10 say how the TIME grows; these counters say whether the plan is
  * approaching a memory cliff (spill onset, task peaks nearing the
  * per-task share of executor memory) before it shows up as wall-clock.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.MemProbe q_coloc q_clump …
  */
object MemProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    // Shuffle-partition override: at 100× data a fixed 32-partition layout
    // carries 100× per-task state — the first knob a real deployment turns
    // (or AQE's initialPartitionNum) before touching the plan.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // Scan-split override: the 8 MB default is fixture-scale sizing (engage
    // all cores on MB-size files); at sf10-scale probes it inflates scan
    // task counts ~16× vs the 128 MB production default, which skews the
    // very scale evidence this probe collects. Probe runs that argue about
    // production behaviour should set SPARK_GRAFT_MAX_PARTITION_BYTES=128m.
    val maxPartitionBytes =
      sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")
    val openCostInBytes =
      sys.env.getOrElse("SPARK_GRAFT_OPEN_COST_BYTES", "1m")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      .config("spark.sql.files.openCostInBytes", openCostInBytes)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val taskPeak = new AtomicLong(0L) // max per-task peak execution memory
    val spillMem = new LongAdder
    val spillDisk = new LongAdder
    val shuffleWrite = new LongAdder
    // Host-load-robust work measures: summed executor CPU time is stable
    // under co-tenant noise that swings wall clock 2-3x (round-18 A/B
    // instrument), run time adds scheduler/IO wait; task count tracks
    // stage fan-out.
    val cpuTime = new LongAdder   // ns
    val runTime = new LongAdder   // ms
    val gcTime = new LongAdder    // ms
    val taskCount = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          taskPeak.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
          spillMem.add(m.memoryBytesSpilled)
          spillDisk.add(m.diskBytesSpilled)
          shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
          cpuTime.add(m.executorCpuTime)
          runTime.add(m.executorRunTime)
          gcTime.add(m.jvmGCTime)
          taskCount.add(1L)
        }
      }
    })

    // JVM heap sampler (local mode: driver heap IS executor heap)
    val heapPeak = new AtomicLong(0L)
    val sampler = new Thread(() => {
      val rt = Runtime.getRuntime
      while (!Thread.currentThread().isInterrupted) {
        heapPeak.getAndUpdate(p => math.max(p, rt.totalMemory() - rt.freeMemory()))
        try Thread.sleep(50)
        catch { case _: InterruptedException => Thread.currentThread().interrupt() }
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_coloc", "q_ecaviar", "q_coloc_pip", "q_clump", "q_eqtl_susie",
        "q_setsim_join", "q_minhash", "q_near_dup")

    spark.read.parquet(s"$sfDir/nation.parquet").count() // warm footers/codegen

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[memprobe] unknown query $name")
        case Some(fn) =>
          var best = Double.MaxValue
          var bestStats = (0L, 0L, 0L, 0L, 0L)
          var bestWork = (0L, 0L, 0L, 0L)
          var haveWork = false
          (1 to runs).foreach { _ =>
            spark.catalog.clearCache()
            System.gc()
            taskPeak.set(0L); spillMem.reset(); spillDisk.reset(); shuffleWrite.reset()
            cpuTime.reset(); runTime.reset(); taskCount.reset(); gcTime.reset()
            heapPeak.set(0L)
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.mode("overwrite").format("noop").save()
            val sec = (System.nanoTime() - t0) / 1e9
            // keep the MIN cpu attempt too (first-attempt codegen/JIT cost
            // inflates CPU exactly like wall clock); emitted as
            // cpu_sec_min/... so a reader can't mistake the record for one
            // coherent attempt — sec/spill/shuffle come from the min-WALL
            // attempt, the work metrics from the min-CPU one.
            if (!haveWork || cpuTime.sum() < bestWork._1) {
              bestWork = (cpuTime.sum(), runTime.sum(), taskCount.sum(), gcTime.sum())
              haveWork = true
            }
            if (sec < best) {
              best = sec
              bestStats = (taskPeak.get(), spillMem.sum(), spillDisk.sum(),
                shuffleWrite.sum(), heapPeak.get())
            }
          }
          val (pk, sm, sd, sw, hp) = bestStats
          val (ct, rt, tc, gt) = bestWork
          // raw stdout line — survives any log-tail truncation per query
          // (println goes through the sbt logger; keep lines short)
          println(
            s"""{"query":"$name","sec":${"%.3f".formatLocal(java.util.Locale.ROOT, best)},""" +
              s""""task_peak_exec_mb":${pk / 1048576},"spill_mem_mb":${sm / 1048576},""" +
              s""""spill_disk_mb":${sd / 1048576},"shuffle_write_mb":${sw / 1048576},""" +
              s""""heap_peak_mb":${hp / 1048576},""" +
              s""""cpu_sec_min":${"%.3f".formatLocal(java.util.Locale.ROOT, ct / 1e9)},""" +
              s""""run_sec_min":${"%.3f".formatLocal(java.util.Locale.ROOT, rt / 1e3)},""" +
              s""""tasks_min_cpu":$tc,"gc_sec_min":${"%.3f".formatLocal(java.util.Locale.ROOT, gt / 1e3)},"sf":"$sfDir"}""")
      }
    }
    spark.stop()
  }
}
