package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession

/** Experiment-sweep harness (SURVEY.md §2.B B1-B3): parameter-grid loop,
  * run-directory naming convention, and per-run log capture — the shape
  * of the reference's `wheel/run_batch.sh` + `run_mr_real.sh`, kept so
  * the A10 scan operators have a real directory tree to walk.
  *
  * The reference's slowstart knob has no Spark meaning (stage barrier —
  * SURVEY §4); it is accepted and recorded as a run dimension, unused by
  * execution. Closest real levers (AQE) are already on by default.
  */
object Sweep {

  final case class RunConfig(dataset: String, slowstart: Double, rep: Int)

  /** B1: the parameter grid (slowstart × repetitions × datasets),
    * mirroring run_batch.sh:16-19. */
  def grid(datasets: Seq[String], slowstarts: Seq[Double],
      reps: Int): Seq[RunConfig] =
    for {
      d <- datasets; ss <- slowstarts; r <- 1 to reps
    } yield RunConfig(d, ss, r)

  /** B2: run-dir naming `<root>/_<dataset>_slowstart_<ss>/<timestamp>`
    * (run_batch.sh:31-39). */
  def runDir(root: String, cfg: RunConfig, timestamp: String): String =
    f"$root/_${cfg.dataset}_slowstart_${cfg.slowstart}%.1f/$timestamp"

  /** B3: run one job per grid point, capturing a job_output.log (header +
    * progress lines + counter block, reference format) and a monitor.log
    * into the run dir. `job` returns (progress events as (elapsed-sec,
    * map%, red%), counters). Returns the created run dirs. */
  def runSweep(root: String, cfgs: Seq[RunConfig], baseTs: String)(
      job: RunConfig => (Seq[(Int, Int, Int)], Map[String, Long])): Seq[String] =
    cfgs.zipWithIndex.map { case (cfg, i) =>
      val ts = f"${baseTs}_$i%06d"
      val dir = runDir(root, cfg, ts)
      Files.createDirectories(Paths.get(dir))
      val (progress, counters) = job(cfg)
      val base = java.time.LocalDateTime.of(2025, 11, 28, 19, 24, 0)
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
      val progLines = progress.map { case (sec, m, r) =>
        s"${base.plusSeconds(sec).format(fmt)},000 INFO mapreduce.Job:  map $m% reduce $r%"
      }
      val counterLines = "\tGraft Counters" +:
        counters.toSeq.sortBy(_._1).map { case (k, v) => s"\t\t$k=$v" }
      write(s"$dir/job_output.log",
        (s"Input: ${cfg.dataset} Slowstart: ${cfg.slowstart}" +:
          (progLines ++ counterLines)).mkString("", "\n", "\n"))
      val monitor = (0 until 3).flatMap { step =>
        (1 to 3).map(n =>
          s"[worker$n-node$n] CPU: ${10 * (step + n)}.00% | MEM: ${20 + n}%") :+ "----"
      }
      write(s"$dir/monitor.log",
        ("===== Real Performance Monitor Started =====" +: monitor)
          .mkString("", "\n", "\n"))
      dir
    }

  private def write(path: String, content: String): Unit =
    Files.write(Paths.get(path), content.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
}
