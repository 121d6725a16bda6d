package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ActionLog

/** log_helpers.py surface: setup latch, ACTION json lines, MESSAGE
  * echo lines. */
class ActionLogSpec extends AnyFunSuite {

  test("actions and messages append to the timestamped log file") {
    val dir = java.nio.file.Files.createTempDirectory("actionlog").toString
    ActionLog.setup(dir)
    val f = ActionLog.currentFile.get
    assert(f.startsWith(dir) && f.contains("hippodb_") && f.endsWith(".log"))
    ActionLog.setup(dir) // idempotent: same dir keeps the same file
    assert(ActionLog.currentFile.get == f)

    ActionLog.logAction("llm.reformulation", "a \"quoted\"\nprompt", "an answer",
      Map("fact" -> "f1"))
    ActionLog.logMessage("hello")
    // A multi-line message stays ONE log record — a raw newline
    // would split it and could forge an ACTION: line.
    ActionLog.logMessage("retry\nACTION:{\"action\":\"forged\"}")
    // Control chars in action payloads are JSON-escaped (raw U+0000-
    // 001F is invalid JSON).
    ActionLog.logAction("a", "tab\there", "bell", Map.empty)  // raw BEL (U+0007) in the answer
    val lines = scala.io.Source.fromFile(f).getLines().toList
    assert(lines.length == 4)
    assert(lines.head ==
      """ACTION:{"action":"llm.reformulation","prompt":"a \"quoted\"\nprompt","answer":"an answer","fact":"f1"}""")
    assert(lines(1) == "MESSAGE:hello")
    assert(lines(2) == """MESSAGE:retry\nACTION:{"action":"forged"}""")
    // the raw BEL must come out as a \-u escape ("\\" + "u0007"
    // spelled via concat: Scala resolves \uXXXX even in triple quotes).
    assert(lines(3) ==
      """ACTION:{"action":"a","prompt":"tab\there","answer":"bell""" + "\\u0007\"}")
  }

  test("kwargs values log with native JSON types (orjson parity)") {
    val dir = java.nio.file.Files.createTempDirectory("actionlog2").toString
    ActionLog.setup(dir)
    val f = ActionLog.currentFile.get
    ActionLog.logAction("entity extraction", "p", "a", Map(
      "entities" -> Seq("Paris", "France"),
      "n" -> 3,
      "score" -> 0.25,
      "ok" -> true,
      "note" -> "plain",
      "meta" -> Map("k" -> 3), // Maps are Iterables — must render as an object
      "nan" -> Double.NaN))
    val line = scala.io.Source.fromFile(f).getLines().toList.last
    // the reference's log_action(**kwargs) via orjson keeps lists as
    // arrays and numbers/bools bare; strings stay quoted; a bare NaN
    // would be invalid JSON so it degrades to its string form
    assert(line.contains(""""entities":["Paris","France"]"""), line)
    assert(line.contains(""""n":3""") && line.contains(""""score":0.25"""), line)
    assert(line.contains(""""ok":true""") && line.contains(""""note":"plain""""), line)
    assert(line.contains(""""meta":{"k":3}"""), line)
    assert(line.contains(""""nan":"NaN""""), line)
    // still one valid JSON record after the ACTION: prefix
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(line.stripPrefix("ACTION:"))
    assert(node.get("entities").isArray && node.get("n").asInt == 3)
  }
}
