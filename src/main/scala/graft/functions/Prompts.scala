package graft.functions

/** Prompt builders — the reference's prompts.py surface. The LLM the
  * prompts feed is behind the LlmBackend trait (stubbed here); the
  * templates themselves are plain functions so the annotation
  * pipeline's plumbing is complete. Wording is our own; the INPUTS
  * and INTENT mirror reference prompts.py:1-102.
  */
object Prompts {

  /** prompts.py contextualization_prompt: summarize what a text is
    * about in one sentence. */
  def contextualization(text: String): String =
    s"""Describe in one sentence what the following text is about.
       |$text""".stripMargin

  /** prompts.py annotation_prompt: extract standalone facts. */
  def annotation(text: String, context: String): String =
    s"""Context: $context
       |List the factual statements in the following text as bullet
       |points, one self-contained fact per line.
       |$text""".stripMargin

  /** prompts.py reformulation_prompt: make a fact self-contained. */
  def reformulation(fact: String, context: String, text: String): String =
    s"""Context: $context
       |Source text: $text
       |Rewrite this fact as a single self-contained sentence:
       |$fact""".stripMargin

  /** prompts.py entity_extraction_prompt. */
  def entityExtraction(fact: String, context: String): String =
    s"""Context: $context
       |List the entities involved in this fact as bullet points:
       |$fact""".stripMargin

  /** prompts.py confrontation_prompt: is the new fact already implied? */
  def confrontation(fact: String, context: String, otherFact: String): String =
    s"""Context: $context
       |Known fact: $otherFact
       |Does the known fact already state the following? Answer yes or no.
       |$fact""".stripMargin

  /** prompts.py entity_equivalence_prompt. */
  def entityEquivalence(entity: String, other: String, fact: String): String =
    s"""In the context of the fact "$fact", do "$entity" and "$other"
       |refer to the same entity? Answer yes or no.""".stripMargin

  /** prompts.py retrieval_prompt: RAG answer over retrieved facts. */
  def retrieval(query: String, facts: String): String =
    s"""Using only these facts:
       |$facts
       |Answer the question: $query""".stripMargin

  /** prompts.py:51 entity_selection_prompt: is this entity explicitly
    * involved in the fact? (yes/no filter after extraction). */
  def entitySelection(fact: String, entity: String): String =
    s"""Fact: $fact
       |Is the entity "$entity" explicitly named in this fact?
       |Answer yes or no.""".stripMargin

  /** prompts.py:66 new_entities_prompt (via get_new_entities_prompt):
    * propose entities for a fact, seeded with any already-known ones
    * itemized as bullets ("-" when none are known). */
  def newEntities(fact: String, context: String, entities: Seq[String]): String = {
    val seed =
      if (entities.nonEmpty) TextHelpers.itemizeList(entities) else "-"
    s"""Context: $context
       |List the standalone concepts involved in this fact, one name
       |per line (answer None if there are none):
       |Fact: $fact
       |Entities:
       |$seed""".stripMargin
  }

  /** prompts.py:86 question_prompt: answer a question from numbered
    * facts, citing the number of any fact used. */
  def question(question: String, facts: String): String =
    s"""$question
       |Answer using the numbered facts below, citing the number of
       |any fact your answer relies on:
       |$facts""".stripMargin
}

/** Text helpers — the reference's helpers.py surface. */
object TextHelpers {

  /** helpers.py:7 is_yes. */
  def isYes(answer: String): Boolean =
    answer.trim.toLowerCase.startsWith("y")

  /** helpers.py:12 first_sentence (punctuation-based tokenizer — the
    * reference uses nltk punkt; offline equivalent). */
  def firstSentence(text: String): String = {
    val t = text.trim
    val m = java.util.regex.Pattern.compile("(?<=[.!?])\\s").matcher(t)
    if (m.find()) t.substring(0, m.start()).trim else t
  }

  /** helpers.py:18 parse_bullet_points. */
  def parseBulletPoints(text: String, onlyFirstBullets: Boolean = false): List[String] = {
    val bullets = Seq("- ", "* ", "• ")
    var t = text.trim
    if (t.startsWith("None")) return Nil
    if (Seq("Here are", "Facts", "Entities").exists(t.startsWith)) {
      val i = t.indexOf('\n')
      if (i >= 0) t = t.substring(i + 1)
    }
    val head = t.split("\n", 2).head.toLowerCase
    if (head.contains("no facts") || head.contains("no entities")) return Nil
    var lines = t.split("\n").map(_.trim).toList
    if (onlyFirstBullets) {
      val kept = scala.collection.mutable.ListBuffer(lines.head)
      var rest = lines.tail
      while (rest.nonEmpty &&
        (bullets.exists(rest.head.startsWith) || rest.head.matches("^\\d+\\..*"))) {
        kept += rest.head; rest = rest.tail
      }
      lines = kept.toList
    }
    lines.map { x =>
      if (bullets.exists(x.startsWith)) x.drop(2).trim
      else if (x.matches("^\\d+\\..*")) x.split("\\.", 2)(1).trim
      else x
    }.filter(x => x.nonEmpty && !x.startsWith("None"))
  }

  /** helpers.py:62 itemize_list. */
  def itemizeList(items: Seq[Any]): String =
    items.map("- " + _).mkString("\n")

  /** Minimal JSON string escaper — THE one escape rule for every
    * hand-rendered JSON surface (ActionLog records, GraftView
    * payloads): backslash, quote, and ALL control chars U+0000–001F
    * (raw control chars are invalid JSON and crash consumers'
    * JSON.parse). */
  def escapeJson(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** helpers.py:67 choice_selection. */
  def choiceSelection(answer: String, choices: Seq[String]): Option[String] = {
    val a = answer.trim.toLowerCase
    if (a.startsWith("none")) None
    else choices.find(c => a.startsWith(c.toLowerCase))
      .orElse(choices.find(c => a.contains(c.toLowerCase)))
  }
}
