package graft.functions

import java.nio.file.{Files, Paths, StandardOpenOption}

/** The reference's log_helpers.py surface (log_setup / log_action /
  * log_message): a timestamped action log of LLM/db interactions as
  * one "ACTION:{json}" line per call, "MESSAGE:" lines echoed to
  * stdout.
  *
  * Spark note: this is a DRIVER-side trace of orchestration-level
  * actions (the reference logs from its single process). Executor-
  * side work (the partition-wise LLM/NLI passes) already flows
  * through Spark's own executor logs/event log — fanning per-task
  * writes into one file would serialize executors on a lock and is
  * deliberately NOT done here. */
object ActionLog {

  @volatile private var path: Option[java.nio.file.Path] = None

  private def esc(s: String): String = TextHelpers.escapeJson(s)

  /** log_setup: choose the log file (timestamped name under `dir`,
    * created if absent). Idempotent for the same dir — paths are
    * NORMALIZED first, so "logs" and "./logs" hit the same latch,
    * like the reference's _is_setup flag. */
  def setup(dir: String): Unit = synchronized {
    val d = Paths.get(dir).toAbsolutePath.normalize
    if (!Files.exists(d)) Files.createDirectories(d)
    val already = path.exists(_.getParent == d)
    if (!already) {
      val dt = new java.text.SimpleDateFormat("yyyy-MM-dd_HH-mm-ss")
        .format(new java.util.Date())
      path = Some(d.resolve(s"hippodb_$dt.log"))
    }
  }

  private def write(line: String): Unit = synchronized {
    path.foreach { p =>
      Files.write(p, (line + "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** log_action: one JSON record per action (prompt/answer
    * stringified as the reference does; extra fields appended). */
  def logAction(action: String, prompt: Any, answer: Any,
      kwargs: Map[String, String] = Map.empty): Unit = {
    val extra = kwargs.toSeq.sortBy(_._1)
      .map { case (k, v) => s""","${esc(k)}":"${esc(v)}"""" }.mkString
    write(s"""ACTION:{"action":"${esc(action)}","prompt":"${esc(String.valueOf(prompt))}","answer":"${esc(String.valueOf(answer))}"$extra}""")
  }

  /** log_message: logged AND printed, as the reference does. The
    * LOGGED copy escapes line breaks — the log is one record per
    * line, and a raw embedded newline would split the record (or
    * forge an ACTION: line); the console echo stays verbatim. */
  def logMessage(message: String): Unit = {
    write("MESSAGE:" + message.replace("\\", "\\\\")
      .replace("\n", "\\n").replace("\r", "\\r"))
    println(message)
  }

  /** Current log file (for tests/tools). */
  def currentFile: Option[String] = path.map(_.toString)
}
