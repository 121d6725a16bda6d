package graft.functions

/** Deterministic stand-ins for the model runtimes the reference calls
  * out to (none are installed in this container — STUBS, clearly
  * marked). The interfaces are what a production deployment would
  * implement with real models; everything downstream of them in the
  * Spark plans is real.
  *
  *  - Embedder       ~ SentenceTransformerEmbeddings (annotator.py:74)
  *  - NliModel       ~ cross-encoder NLI (nlp_additional.py:4)
  *  - LlmBackend     ~ llm_backend.py load_llm backends
  *  - MediaDecoder   ~ image/audio codecs for multimodal columns
  */
object Stubs

/** Text → fixed-dim embedding. */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
}

/** Deterministic hash-based embedder (mirrors the reference tests'
  * FakeEmbeddings, test_storage.py:25): token hashes scatter into a
  * seeded pseudo-random projection, L2-normalized. */
final class HashEmbedder(val dim: Int = 64, seed: Long = 42L) extends Embedder {
  def embed(text: String): Array[Float] = {
    val v = new Array[Double](dim)
    text.split(" ").foreach { w =>
      var h = seed
      w.foreach(c => h = h * 131 + c)
      var i = 0
      while (i < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L // LCG step
        v(i) += (h >>> 33).toDouble / (1L << 31).toDouble - 0.5
        i += 1
      }
    }
    val n = math.sqrt(v.map(x => x * x).sum) max 1e-12
    v.map(x => (x / n).toFloat)
  }
}

/** Premise/hypothesis entailment. */
trait NliModel extends Serializable {
  def entails(premise: String, hypothesis: String): Boolean
}

/** Token-containment heuristic NLI stub: premise entails hypothesis
  * when it covers >= 80% of the hypothesis' content tokens. */
final class HeuristicNli extends NliModel {
  def entails(premise: String, hypothesis: String): Boolean = {
    val p = premise.toLowerCase.split("\\W+").toSet
    val h = hypothesis.toLowerCase.split("\\W+").filter(_.length > 2).toSet
    h.nonEmpty && h.count(p.contains).toDouble / h.size >= 0.8
  }
}

/** GBNF grammar constants (grammars.py). */
object Grammars {
  /** grammars.py:1 grammar_yn — constrains a completion to Yes/No. */
  val YesNo = "root ::= (\"Yes\" | \"No\")"
}

/** Prompt → completion (llm_backend.py LlmBackend): optional GBNF
  * grammar constraint and stop sequences; a backend that cannot
  * enforce grammars reports handlesGrammars = false and callers fall
  * back to parsing free text (llm_backend.py:8 handles_grammars). */
trait LlmBackend extends Serializable {
  def handlesGrammars: Boolean = false
  def invoke(prompt: String, maxTokens: Int = 256,
      grammar: Option[String] = None, stop: Seq[String] = Nil): String
}

/** Echo-style deterministic LLM stub: "extracts" facts by returning
  * the prompt's payload lines as bullets (keeps the annotation
  * pipeline's plumbing testable without a model). Recognizes the two
  * prompt shapes the annotation pipeline threads through it:
  *
  *  - new_entities (prompts.py:66): answers the fact's long words
  *    (≥ 5 chars, first-appearance order) as bullets, "None" when
  *    there are none — the deterministic stand-in for entity
  *    extraction, so the prompt→parse_bullet_points→selection
  *    pipeline of annotator.py runs end to end without a model and
  *    lands on the same entity set the long-word heuristic defines;
  *  - entity_selection (prompts.py:51) under the Yes/No grammar:
  *    "Yes" iff the quoted entity is literally a token of the fact
  *    (what "explicitly named" means for a stub).
  *
  * Other Yes/No-grammar prompts answer deterministically from a
  * prompt hash (a STUB decision — the pipeline's yes/no branches are
  * exercised by the NliModel stub, not this); stop sequences are
  * honored by truncation. */
final class TemplateLlm extends LlmBackend {
  override def handlesGrammars: Boolean = true

  /** The fact block of a prompt: text after the "Fact: " header that
    * FOLLOWS the given template marker (so a context that itself
    * contains "Fact: " cannot shift the anchor), up to the next
    * section header (facts may span lines). */
  private def factPayload(prompt: String, after: String, upTo: String): Option[String] = {
    val m = math.max(prompt.indexOf(after), 0)
    val i = prompt.indexOf("Fact: ", m)
    if (i < 0) None
    else {
      val rest = prompt.substring(i + 6)
      val j = rest.indexOf(upTo)
      Some(if (j >= 0) rest.substring(0, j) else rest)
    }
  }

  def invoke(prompt: String, maxTokens: Int = 256,
      grammar: Option[String] = None, stop: Seq[String] = Nil): String = {
    val raw = grammar match {
      case Some(g) if g == Grammars.YesNo =>
        val sel = prompt.indexOf("Is the entity \"")
        if (sel >= 0) {
          // entity_selection: entity between the quotes, fact above
          // (this prompt STARTS with its "Fact: " header).
          val after = prompt.substring(sel + 15)
          val entity = after.substring(0, math.max(after.indexOf("\" explicitly named"), 0))
          val fact = factPayload(prompt, "", "\nIs the entity \"").getOrElse("")
          if (entity.nonEmpty && fact.split("\\s+").contains(entity)) "Yes" else "No"
        } else if (prompt.hashCode % 2 == 0) "Yes" else "No"
      case _ if prompt.contains("List the entities involved in this fact as bullet points:") =>
        // entity_extraction (annotator.py:148's actual prompt): same
        // deterministic answer as new_entities — the fact's long
        // words, first-appearance order, as bullets — so the two
        // extraction variants agree under the stub. Guard and anchor
        // are the SAME full header string (a guard on a shorter
        // prefix would hijack prompts that merely mention it and
        // mis-anchor the substring arithmetic).
        val extHead = "List the entities involved in this fact as bullet points:"
        val fact = prompt.substring(prompt.lastIndexOf(extHead) + extHead.length)
          .stripPrefix("\n")
        val words = fact.split("\\s+").filter(_.length >= 5).distinct
        if (words.isEmpty) "None" else TextHelpers.itemizeList(words.toIndexedSeq)
      case _ if prompt.contains("List the standalone concepts") =>
        // new_entities: the fact's long words, first-appearance order.
        // WHITESPACE-delimited (not split(" ")): a bullet list cannot
        // round-trip a token containing a newline through
        // parse_bullet_points, so tokens are words in the usual sense
        // — the selection check above uses the same tokenization.
        val fact = factPayload(prompt, "List the standalone concepts", "\nEntities:")
          .getOrElse("")
        val words = fact.split("\\s+").filter(_.length >= 5).distinct
        if (words.isEmpty) "None" else TextHelpers.itemizeList(words.toIndexedSeq)
      case _ if prompt.contains("Rewrite this fact as a single self-contained sentence:") =>
        // reformulation: the stub's "rewrite" is the identity — the
        // fact comes back verbatim (a real backend would make it
        // self-contained), so the pipeline stage exists without
        // perturbing stored text. Anchor on the LAST occurrence of
        // the header (the context/source-text sections PRECEDE it
        // and in annotate contain the fact text itself, so a
        // first-occurrence search could anchor inside them) and
        // tolerate a missing trailing newline (empty fact → "").
        val head = "Rewrite this fact as a single self-contained sentence:"
        prompt.substring(prompt.lastIndexOf(head) + head.length).stripPrefix("\n")
      case _ =>
        val payload = prompt.linesIterator.toList.lastOption.getOrElse("")
        payload.split("(?<=\\.) ").filter(_.nonEmpty).map("- " + _).mkString("\n")
    }
    stop.foldLeft(raw) { (acc, s) =>
      val i = acc.indexOf(s); if (i >= 0) acc.substring(0, i) else acc
    }
  }
}

/** Opaque media bytes → typed metadata. */
trait MediaDecoder extends Serializable {
  def decode(bytes: Array[Byte]): MediaDecoder.Meta
}

object MediaDecoder {
  final case class Meta(nBytes: Long, width: Int, height: Int, channels: Int)

  /** STUB decoder: deterministic fake metadata from byte stats (no
    * codecs in this container). A real deployment would decode the
    * actual image/audio/video header here.
    *
    * The height formula hashes the first CODE POINT of the payload
    * decoded as UTF-8 (not the first raw byte): the cross-engine
    * oracles restate it as DuckDB `unicode(substr(text, 1, 1))`,
    * which is a code point — first-byte hashing diverges on any
    * non-ASCII leading char (e.g. 'é': byte 195 vs cp 233). Empty
    * payloads hash as 0 (the oracles CASE-guard the same). */
  val stub: MediaDecoder = new MediaDecoder {
    def decode(bytes: Array[Byte]): Meta = {
      val cp =
        if (bytes.isEmpty) 0
        else {
          // A UTF-8 code point spans ≤4 bytes — decode only the head.
          val head = new String(bytes, 0, math.min(4, bytes.length),
            java.nio.charset.StandardCharsets.UTF_8)
          if (head.isEmpty) 0 else head.codePointAt(0)
        }
      Meta(
        nBytes = bytes.length.toLong,
        width = bytes.length % 640,
        height = (cp * 7) % 480,
        channels = 3)
    }
  }
}
