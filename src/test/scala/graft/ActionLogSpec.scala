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
    val lines = scala.io.Source.fromFile(f).getLines().toList
    assert(lines.length == 2)
    assert(lines.head ==
      """ACTION:{"action":"llm.reformulation","prompt":"a \"quoted\"\nprompt","answer":"an answer","fact":"f1"}""")
    assert(lines(1) == "MESSAGE:hello")
  }
}
