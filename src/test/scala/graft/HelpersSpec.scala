package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Prompts, TextHelpers}

/** Mirrors reference tests/test_helpers.py behaviors. */
class HelpersSpec extends AnyFunSuite {

  test("parseBulletPoints handles dashes, stars and numbering") {
    val t1 = "Here are some bullet points:\n- one\n- two\n- three"
    assert(TextHelpers.parseBulletPoints(t1) == List("one", "two", "three"))
    assert(TextHelpers.parseBulletPoints(t1, onlyFirstBullets = true) == List("one", "two", "three"))
    val t2 = "* alpha\n* beta"
    assert(TextHelpers.parseBulletPoints(t2) == List("alpha", "beta"))
    val t3 = "1. first\n2. second"
    assert(TextHelpers.parseBulletPoints(t3) == List("first", "second"))
    assert(TextHelpers.parseBulletPoints("None") == Nil)
    assert(TextHelpers.parseBulletPoints("There are no facts here.\nmore") == Nil)
  }

  test("onlyFirstBullets stops at the first non-bullet line") {
    val t = "Entities\n- a\n- b\nAnd some trailing prose\n- c"
    assert(TextHelpers.parseBulletPoints(t, onlyFirstBullets = true) == List("a", "b"))
  }

  test("firstSentence / isYes / itemizeList / choiceSelection") {
    assert(TextHelpers.firstSentence("One. Two. Three.") == "One.")
    assert(TextHelpers.firstSentence("no punctuation at all") == "no punctuation at all")
    assert(TextHelpers.isYes(" Yes, definitely"))
    assert(!TextHelpers.isYes("nope"))
    assert(TextHelpers.itemizeList(Seq("a", "b")) == "- a\n- b")
    assert(TextHelpers.choiceSelection("blue, I think", Seq("red", "blue")) == Some("blue"))
    assert(TextHelpers.choiceSelection("None of these", Seq("red")) == None)
  }

  test("prompt builders embed their inputs") {
    assert(Prompts.annotation("TEXT", "CTX").contains("TEXT"))
    assert(Prompts.annotation("TEXT", "CTX").contains("CTX"))
    assert(Prompts.confrontation("A", "C", "B").contains("yes or no"))
    assert(Prompts.retrieval("Q", "- f1").contains("Q"))
  }

  test("entity selection / new entities / question prompts (prompts.py:51,66,86)") {
    val sel = Prompts.entitySelection("F", "E")
    assert(sel.contains("F") && sel.contains("\"E\"") && sel.contains("yes or no"))
    // seeded with known entities → itemized; none known → the reference's "-"
    val seeded = Prompts.newEntities("F", "C", Seq("a", "b"))
    assert(seeded.contains("- a\n- b"))
    assert(Prompts.newEntities("F", "C", Nil).trim.endsWith("-"))
    val q = Prompts.question("WHY", "1. f1\n2. f2")
    assert(q.contains("WHY") && q.contains("2. f2"))
  }
}
