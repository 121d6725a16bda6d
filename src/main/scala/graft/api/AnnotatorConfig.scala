package graft.api

/** The annotator's tunable surface, mirroring the reference's config
  * (annotator.py:32-34 AnnotatorConfig defaults / the `annotator:`
  * section of the configs yaml files; the model fields of the yaml
  * map to graft's injected Embedder/NliModel/LlmBackend traits
  * instead).
  *
  * `asParams` serializes to the flat string map HippoDb.save persists
  * as parameters.json — the analog of the parameters.yaml the
  * reference drops in the db directory and reloads on open
  * (annotator.py:66-69). */
final case class AnnotatorConfig(
    splitStrategy: String = "recursive", // annotator.py:32
    chunkSize: Int = 1000, // annotator.py:33
    ctxSize: Int = 5000) { // annotator.py:34

  def asParams: Map[String, String] = Map(
    "split_strategy" -> splitStrategy,
    "chunk_size" -> chunkSize.toString,
    "ctx_size" -> ctxSize.toString)
}

object AnnotatorConfig {
  /** Rebuild from a HippoDb parameters map. Missing OR malformed
    * values degrade to the reference defaults (the _load_config
    * fallback) — parameters.json is externally editable, and a
    * corrupt numeric must not make a db directory unopenable. */
  def fromParams(params: Map[String, String]): AnnotatorConfig = {
    val d = AnnotatorConfig()
    AnnotatorConfig(
      splitStrategy = params.getOrElse("split_strategy", d.splitStrategy),
      chunkSize = params.get("chunk_size").flatMap(_.toIntOption).getOrElse(d.chunkSize),
      ctxSize = params.get("ctx_size").flatMap(_.toIntOption).getOrElse(d.ctxSize))
  }
}
