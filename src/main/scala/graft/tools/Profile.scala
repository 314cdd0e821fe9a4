package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-stage profile of one or more SparkEntry queries — the guide-§1/§7
  * empirical loop without a UI: run the query (noop-style full
  * materialization), collect every stage's wall time, task count, input /
  * shuffle-read / shuffle-write bytes and spill through a SparkListener,
  * and print the stages sorted by executor-time share. Usage:
  *   SPARK_GRAFT_CPUS=32 tools/run.sh graft.tools.Profile <sfDir> <q> [q ...]
  */
object Profile {

  final case class StageRow(id: Int, name: String, wallMs: Long,
                            tasks: Int, execRunMs: Long, cpuMs: Long,
                            inputMB: Double, shReadMB: Double,
                            shWriteMB: Double, spillMB: Double,
                            gcMs: Long)

  final class Collector extends SparkListener {
    val stages = mutable.ArrayBuffer.empty[StageRow]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val m = si.taskMetrics
      val wall = (for {a <- si.completionTime; b <- si.submissionTime}
        yield a - b).getOrElse(0L)
      stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n'), wall,
        si.numTasks, m.executorRunTime, m.executorCpuTime / 1000000L,
        m.inputMetrics.bytesRead / 1e6,
        m.shuffleReadMetrics.totalBytesRead / 1e6,
        m.shuffleWriteMetrics.bytesWritten / 1e6,
        (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6,
        m.jvmGCTime)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup (JIT/codegen) on the smallest SF — overridable (r16 advice:
    // the path was hardcoded)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")
    SparkEntry.queries("q01_pricing_summary")(spark, warmDir)
      .write.format("noop").mode("overwrite").save()
    args.tail.foreach { name =>
      val col = new Collector
      spark.sparkContext.addSparkListener(col)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.analytics.Caches.clear()
      // drain the async listener bus BEFORE snapshotting (r16 advice:
      // late-completing stages were silently missing from the report).
      // The bus itself is private[spark]; poll until the stage list has
      // been stable for 200 ms (cap 3 s) — diagnostic-tool latency only.
      val deadline = System.nanoTime() + 3000000000L
      var last = -1
      while (System.nanoTime() < deadline && col.stages.size != last) {
        last = col.stages.size
        Thread.sleep(200)
      }
      spark.sparkContext.removeSparkListener(col)
      println(f"===== $name%s total=$sec%.3f s, ${col.stages.size}%d stages, " +
        f"sum(stage wall)=${col.stages.map(_.wallMs).sum / 1e3}%.3f s =====")
      val top = col.stages.sortBy(-_.wallMs).take(25)
      println(f"${"stage"}%6s ${"wall_s"}%8s ${"tasks"}%6s ${"run_s"}%8s " +
        f"${"cpu_s"}%8s ${"in_MB"}%8s ${"shR_MB"}%8s ${"shW_MB"}%8s " +
        f"${"spill"}%6s ${"gc_s"}%6s  name")
      top.foreach { s =>
        println(f"${s.id}%6d ${s.wallMs / 1e3}%8.3f ${s.tasks}%6d " +
          f"${s.execRunMs / 1e3}%8.2f ${s.cpuMs / 1e3}%8.2f " +
          f"${s.inputMB}%8.1f ${s.shReadMB}%8.1f ${s.shWriteMB}%8.1f " +
          f"${s.spillMB}%6.1f ${s.gcMs / 1e3}%6.2f  ${s.name.take(60)}")
      }
    }
    spark.stop()
  }
}
