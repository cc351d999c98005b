package graft.llm

import graft.model.{Document, Element}

/**
 * Pluggable LLM client (reference: lib/sycamore/sycamore/llms/ — OpenAI,
 * Anthropic, Bedrock, Gemini clients behind one interface; llms/llms.py).
 * The engine only needs generate/generateBatch; sync/async/batch modes
 * (reference: transforms/base_llm.py:28-74 LLMMode) collapse to
 * generateBatch over partition-local batches.
 */
trait LlmClient extends Serializable {
  def generate(prompt: String): String
  def generateBatch(prompts: Seq[String]): Seq[String] = prompts.map(generate)
}

/**
 * Async mode (reference: transforms/base_llm.py:28-74 — LLMMode.ASYNC issues
 * batched futures instead of sequential calls): wraps any client so
 * `generateBatch` overlaps up to `concurrency` in-flight requests while
 * preserving input order. For a latency-bound endpoint this turns an
 * llm_map/llm_filter partition batch from sum(latency) into
 * ~ceil(n/concurrency) x latency; the per-request `generate` contract is
 * unchanged, so correctness is identical to the sequential default.
 *
 * The pool is @transient lazy: each executor builds its own after
 * deserialization (thread pools don't serialize), threads are daemons so an
 * executor shutdown never hangs on it.
 */
final class AsyncLlmClient(underlying: LlmClient, concurrency: Int = 8) extends LlmClient {
  // fail at construction on the driver, not lazily inside an executor task
  require(concurrency >= 1, s"concurrency must be >= 1, got $concurrency")
  @transient private lazy val pool =
    java.util.concurrent.Executors.newFixedThreadPool(concurrency,
      (r: Runnable) => {
        val t = new Thread(r, "graft-llm-async")
        t.setDaemon(true)
        t
      })

  override def generate(prompt: String): String = underlying.generate(prompt)

  override def generateBatch(prompts: Seq[String]): Seq[String] = {
    import java.util.concurrent.Callable
    import scala.jdk.CollectionConverters._
    // invokeAll returns futures in submission order — order preservation is
    // by construction, independent of completion order
    val tasks: Seq[Callable[String]] =
      prompts.map(p => (() => underlying.generate(p)): Callable[String])
    // unwrap ExecutionException so callers see the SAME exception type the
    // sequential default would throw (retry/fallback logic matches on it)
    pool.invokeAll(tasks.asJava).asScala.map { f =>
      try f.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw Option(e.getCause).getOrElse(e)
      }
    }.toSeq
  }
}

/**
 * Deterministic offline fake for tests and zero-egress runs: answers are a
 * pure function of the prompt. Modes:
 *  - "echo:<n>"  — first n chars of the prompt
 *  - "score"     — stable pseudo-score 0-4 from the prompt hash
 *  - "extract"   — first capitalized token in the prompt
 */
final class FakeLlmClient(mode: String = "echo:64") extends LlmClient {
  override def generate(prompt: String): String = mode match {
    case m if m.startsWith("echo:") => prompt.take(m.stripPrefix("echo:").toInt)
    case "score" => (math.abs(scala.util.hashing.MurmurHash3.stringHash(prompt)) % 5).toString
    case "extract" =>
      prompt.split("\\s+").find(t => t.nonEmpty && t.head.isUpper && t.forall(_.isLetter))
        .getOrElse("")
    case other => s"[fake:$other]"
  }
}

/** Fake planner LLM: returns the configured response verbatim regardless of
  * prompt — the offline stand-in for the temperature-0 planning call
  * (reference: tests/unit/query/test_planner.py fakes the plan the same way). */
final class CannedLlmClient(response: String) extends LlmClient {
  override def generate(prompt: String): String = response
}

/** Planner LLM that misbehaves before it cooperates: returns each entry of
  * `bad` (truncated JSON, unknown node_type, plain prose) for the first
  * calls, then `good` forever — the test double for LlmPlanner's
  * retry/repair loop (reference: llms/chained_llm.py generate tries the
  * next chain member when one fails; query/planner.py:105 raises once
  * nothing usable remains). */
final class FlakyLlmClient(bad: Seq[String], good: String) extends LlmClient {
  private val n = new java.util.concurrent.atomic.AtomicInteger(0)
  override def generate(prompt: String): String = {
    val i = n.getAndIncrement()
    if (i < bad.size) bad(i) else good
  }
  /** How many times the planner actually called the model. */
  def calls: Int = n.get()
}

/**
 * Deterministic fake for the llm_cluster_entity flow (reference:
 * docset.py:1590): the group-propose call returns the configured group
 * names; the assignment call maps a value to the first group it contains
 * (case-insensitive), else "Other".
 */
final class FakeClusterLlmClient(groups: Seq[String]) extends LlmClient {
  private val quoted = "\"([^\"]*)\"".r
  override def generate(prompt: String): String =
    if (prompt.contains("Form group names")) groups.mkString("\n")
    else {
      val value = quoted.findFirstMatchIn(prompt).map(_.group(1)).getOrElse("")
      groups.find(g => value.toLowerCase.contains(g.toLowerCase)).getOrElse("Other")
    }
}

/** Prompt template rendering: `{doc_id}`, `{text_representation}`,
  * `{properties.x.y}` placeholders (reference prompt objects render the
  * same dotted fields). */
object PromptTemplate {
  private val ph = "\\{([a-zA-Z0-9_.]+)\\}".r

  def render(template: String, d: Document): String =
    ph.replaceAllIn(template, m =>
      java.util.regex.Matcher.quoteReplacement(d.fieldToValue(m.group(1)).getOrElse("")))

  def renderElement(template: String, d: Document, e: Element): String =
    ph.replaceAllIn(template, m => java.util.regex.Matcher.quoteReplacement(m.group(1) match {
      case "text_representation" => e.text
      case "type"                => e.elementType
      case p if p.startsWith("properties.") =>
        e.prop(p.stripPrefix("properties."))
          .orElse(d.fieldToValue(p)).getOrElse("")
      case p => d.fieldToValue(p).getOrElse("")
    }))
}

/**
 * Entity extraction (reference: transforms/extract_entity.py:50
 * OpenAIEntityExtractor shape): batched over partitions, writes
 * properties[name]. The LLM flavor prompts and parses; the deterministic
 * regex flavor is the offline fake with real extraction semantics.
 */
trait EntityExtractor extends Serializable {
  def name: String
  def extract(docs: Iterator[Document]): Iterator[Document]
}

final class LlmEntityExtractor(client: LlmClient, val name: String, prompt: String)
    extends EntityExtractor {
  override def extract(docs: Iterator[Document]): Iterator[Document] =
    docs.grouped(16).flatMap { batch =>
      val outs = client.generateBatch(batch.map(d => PromptTemplate.render(prompt, d)))
      batch.zip(outs).map { case (d, o) => d.withProp(name, o.trim) }
    }
}

final class RegexEntityExtractor(val name: String, pattern: String, group: Int = 1)
    extends EntityExtractor {
  @transient private lazy val re = pattern.r
  override def extract(docs: Iterator[Document]): Iterator[Document] =
    docs.map { d =>
      re.findFirstMatchIn(d.text).map(m => d.withProp(name, m.group(group))).getOrElse(d)
    }
}
