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

  /** Render a kwargs value as JSON the way the reference's
    * orjson.dumps(**kwargs) does: numbers and booleans bare,
    * sequences as arrays, maps as objects, everything else as an
    * escaped string. Non-finite doubles (invalid JSON bare) fall back
    * to their quoted string form. */
  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case s: String => s""""${esc(s)}""""
    case b: Boolean => b.toString
    case d: Double if !java.lang.Double.isFinite(d) => s""""$d""""
    case f: Float if !java.lang.Float.isFinite(f) => s""""$f""""
    case n @ (_: Int | _: Long | _: Short | _: Byte | _: Float | _: Double) => n.toString
    case n: java.math.BigDecimal => n.toString
    // Map BEFORE Iterable: scala Maps are Iterables, and the generic
    // case would render them as arrays of stringified tuples.
    case m: collection.Map[_, _] =>
      m.toSeq.sortBy(_._1.toString)
        .map { case (k, x) => s""""${esc(String.valueOf(k))}":${jsonVal(x)}""" }
        .mkString("{", ",", "}")
    case seq: Iterable[_] => seq.map(jsonVal).mkString("[", ",", "]")
    case arr: Array[_] => arr.map(jsonVal).mkString("[", ",", "]")
    case other => s""""${esc(String.valueOf(other))}""""
  }

  /** log_action: one JSON record per action (prompt/answer
    * stringified as the reference does; extra fields appended with
    * their NATIVE JSON types — the reference's orjson.dumps keeps
    * entities=[...] an array and counts numeric, so a Map("k" -> 3)
    * here logs "k":3, not "k":"3"). */
  def logAction(action: String, prompt: Any, answer: Any,
      kwargs: Map[String, Any] = Map.empty): Unit = {
    val extra = kwargs.toSeq.sortBy(_._1)
      .map { case (k, v) => s""","${esc(k)}":${jsonVal(v)}""" }.mkString
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
