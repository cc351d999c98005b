package graft.plan

import graft.llm.LlmClient

/**
 * Plan rewrite passes (reference: query/strategy.py — LogicalPlanProcessor
 * subclasses run over the planner's output before execution).
 */
trait QPlanProcessor {
  def apply(plan: QPlan): QPlan
}

/** Type/structure validation pass (reference: strategy.py:48 DefaultPlanValidator). */
object DefaultPlanValidator extends QPlanProcessor {
  def apply(plan: QPlan): QPlan = { plan.validate(); plan }
}

/**
 * Cost guard: insert a Limit before every LLM-powered operator whose subtree
 * has none (reference: strategy.py:235 LimitLlmOperations) — an LLM call per
 * row over an unbounded input is the one thing that must never reach a
 * 100 TB scan.
 */
final case class LimitLlmOperations(maxRecords: Int = 100) extends QPlanProcessor {
  private def isLlm(n: QNode): Boolean = n match {
    case _: QLlmFilter | _: QLlmExtractEntity | _: QLLMClustering => true
    case t: QTopK => t.llmCluster // LLM assignment call per row
    case _ => false
  }

  def apply(plan: QPlan): QPlan = {
    def subtreeHasLimit(p: QPlan, id: Int): Boolean = {
      val n = p.node(id)
      n.isInstanceOf[QLimit] || n.inputs.exists(subtreeHasLimit(p, _))
    }
    // ids shift on insert: re-scan from scratch until fixpoint
    var current = plan
    var changed = true
    while (changed) {
      changed = false
      current.nodes.toSeq.sortBy(_._1).find { case (id, n) =>
        isLlm(n) && !n.inputs.exists(subtreeHasLimit(current, _))
      } match {
        case Some((id, _)) =>
          current = current.insertNode(id,
            QLimit(id, Some("auto-inserted LLM cost guard"), Nil, maxRecords))
          changed = true
        case None =>
      }
    }
    current
  }
}

/**
 * Force a natural-language answer: drop a trailing Sort (it cannot affect a
 * summarized answer) and append SummarizeData when the result is not already
 * one (reference: strategy.py:173 AlwaysSummarize).
 */
object AlwaysSummarize extends QPlanProcessor {
  def apply(plan: QPlan): QPlan = {
    var p = plan
    p.node(p.resultNode) match {
      case _: QSummarizeData => p
      case s: QSort if s.inputs.size == 1 =>
        val trimmed = QPlan(p.query, p.nodes - s.nodeId, s.inputs.head)
        append(trimmed)
      case _ => append(p)
    }
  }
  private def append(p: QPlan): QPlan = {
    val id = p.nodes.keys.max + 1
    p.insertNode(id, QSummarizeData(id, Some("auto-appended answer synthesis"),
      Nil, p.query))
  }
}

/**
 * Analytics rewrite: a leading vector search feeding Count / entity
 * extraction / answer synthesis is WRONG for analytics (top-k retrieval
 * silently truncates the population being counted), so replace it with a
 * full scan + an LlmFilter carrying the query phrase as the predicate
 * (reference: strategy.py:73 RemoveVectorSearchForAnalytics).
 */
object RemoveVectorSearchForAnalytics extends QPlanProcessor {
  def apply(plan: QPlan): QPlan = plan.nodes.get(0) match {
    case Some(v: QQueryVectorDatabase)
        if plan.nodes.size == 1 || (plan.nodes.get(1) match {
          // single-input targets only: insertNode cannot intercept one edge
          // of a multi-input node (e.g. SummarizeData over two branches)
          case Some(n @ (_: QCount | _: QLlmExtractEntity | _: QSummarizeData)) =>
            n.inputs == Seq(0)
          case _ => false
        }) =>
      val scan = QQueryDatabase(0, v.description, Nil, v.index, None)
      plan.replaceNode(0, scan)
        .insertNode(1, QLlmFilter(1, Some("rewritten from vector search"), Nil,
          "text_representation", v.queryPhrase))
    case _ => plan
  }
}

/**
 * Strip non-retrieval tail operators, leaving scan + filters + limit/sort —
 * the shape retrieval-metric evaluation wants
 * (reference: strategy.py:208 OnlyRetrieval).
 */
object OnlyRetrieval extends QPlanProcessor {
  private def isRetrieval(n: QNode): Boolean = n match {
    case _: QDataLoader | _: QQueryDatabase | _: QQueryVectorDatabase |
         _: QBasicFilter | _: QLlmFilter | _: QLimit | _: QSort => true
    case _ => false
  }

  def apply(plan: QPlan): QPlan = {
    // follow the single-input chain from the source and keep the longest
    // all-retrieval prefix
    var last = 0
    var cur = 0
    // nodes.get: the LLM may number nodes from 1 — absent node 0 means
    // "no retrieval prefix to trim", not a crash (the sibling processor's
    // contract); the plan passes through unchanged
    if (!plan.nodes.get(0).exists(isRetrieval)) return plan
    var continue = true
    while (continue) {
      last = cur
      plan.downstreamNodes(cur) match {
        case Seq(next) if isRetrieval(plan.node(next)) => cur = next
        case _ => continue = false
      }
    }
    val keep = scala.collection.mutable.Set[Int]()
    def collect(id: Int): Unit = { keep += id; plan.node(id).inputs.foreach(collect) }
    collect(last)
    QPlan(plan.query, plan.nodes.view.filterKeys(keep).toMap, last)
  }
}

/**
 * Natural-language -> QPlan via a pluggable LLM (reference: query/planner.py:97
 * LlmPlanner.plan — prompt = system text + operator usage docs + index schema
 * + few-shot examples; temperature-0 LLM; JSON parsed into the plan DAG and
 * run through the plan processors).
 */
final class LlmPlanner(client: LlmClient,
                       schema: Map[String, Seq[String]],
                       processors: Seq[QPlanProcessor] = Seq(DefaultPlanValidator)) {

  def plan(question: String): QPlan = plan(question, maxAttempts = 3)

  /** Retry/repair loop: an unusable LLM response (no JSON, truncated JSON,
    * unknown node_type, validator rejection) is fed BACK to the model with
    * the error, and the call retried up to `maxAttempts` times — the
    * engine-side twin of the reference's try-the-next-LLM chain
    * (llms/chained_llm.py generate: each failing chain member falls
    * through to the next; planner.py:105 raises once nothing usable
    * remains). Temperature-0 models still vary under a changed prompt,
    * which is exactly what the appended error text provides. */
  def plan(question: String, maxAttempts: Int): QPlan = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    var prompt = buildPrompt(question)
    var lastErr: Throwable = null
    var attempt = 0
    while (attempt < maxAttempts) {
      val response = client.generate(prompt)
      try {
        val json = extractJson(response)
        val parsed = QPlan.fromJson(json).copy(query = question)
        return processors.foldLeft(parsed)((p, proc) => proc(p))
      } catch {
        case scala.util.control.NonFatal(e) =>
          lastErr = e
          prompt = buildPrompt(question) +
            s"""|
                |Your previous response could not be used:
                |$response
                |Error: ${e.getMessage}
                |Return ONLY the corrected JSON plan.
                |""".stripMargin
      }
      attempt += 1
    }
    throw new IllegalArgumentException(
      s"planner produced no usable plan after $maxAttempts attempts: " +
        s"${lastErr.getMessage}", lastErr)
  }

  /** Operator usage docs generated from the node vocabulary — the planner's
    * instruction set (reference: planner_prompt.py:23-120). */
  def operatorDocs: String = LlmPlanner.OperatorUsage.map { case (name, doc) =>
    s"**$name**: $doc"
  }.mkString("\n")

  def buildPrompt(question: String): String = {
    val schemaText = schema.map { case (table, fields) =>
      s"- $table: ${fields.mkString(", ")}"
    }.mkString("\n")
    s"""You translate an analytics question into a JSON query plan.
       |
       |Available operators:
       |$operatorDocs
       |
       |Available tables and fields:
       |$schemaText
       |
       |Rules:
       |- Output ONLY a JSON object: {"query": str, "result_node": int, "nodes": {id: node}}.
       |- Each node has node_type, node_id, inputs (list of node ids), plus its fields.
       |- Node 0 must be a QueryDatabase or DataLoader source.
       |- Push filters into QueryDatabase's `query` whenever possible.
       |
       |Example:
       |${LlmPlanner.ExamplePlan}
       |
       |Question: $question
       |""".stripMargin
  }

  private def extractJson(response: String): String = {
    val start = response.indexOf('{')
    val end = response.lastIndexOf('}')
    if (start < 0 || end <= start)
      throw new IllegalArgumentException(s"no JSON plan in planner response: $response")
    response.substring(start, end + 1)
  }
}

object LlmPlanner {
  /** Concise usage lines per operator (semantics per SURVEY §3.2 vocabulary). */
  val OperatorUsage: Seq[(String, String)] = Seq(
    "QueryDatabase" -> ("Scan a table. Fields: index (table name), query (optional filter: " +
      "match/match_phrase/term/range/bool.must). Filtering at the source is cheapest."),
    "DataLoader" -> "Load documents from a parquet path. Fields: path.",
    "QueryVectorDatabase" -> ("Vector search: top-K rows most similar to query_phrase. " +
      "Fields: index, query_phrase, K. Approximate — use ONLY for 'any/some similar' " +
      "questions, never for exhaustive analytics; follow with LlmFilter."),
    "BasicFilter" -> ("Filter rows. Fields: field; range_filter (bool); query (match value, " +
      "substring for strings); start/end (inclusive range); is_date (bool)."),
    "LlmFilter" -> "LLM yes/no filter when the predicate is semantic. Fields: field, question.",
    "LlmExtractEntity" -> ("Derive a new field with an LLM. Fields: question, field, " +
      "new_field, new_field_type."),
    "Count" -> "Count records; distinct_field counts unique values. Returns a number.",
    "Sort" -> "Sort by field. Fields: field, descending, default_value (missing-field docs drop if absent).",
    "Limit" -> "Keep the first num_records records.",
    "TopK" -> ("Most/least frequent values of field. Fields: field, K, descending, " +
      "primary_field (unique-count), llm_cluster + llm_cluster_instruction (LLM-normalize " +
      "unbounded string values first). Output docs have properties.key/properties.count."),
    "FieldIn" -> "Keep input-1 docs whose field_one appears among input-2's field_two values.",
    "GroupBy" -> "Group docs by field; feed AggregateCount or AggregateCollect.",
    "AggregateCount" -> "Per-group count over a GroupBy input -> properties.key/properties.count.",
    "AggregateCollect" -> "Per-group collect over a GroupBy input.",
    "KMeanClustering" -> "Cluster docs on embeddings. Fields: new_field, K.",
    "LLMClustering" -> "LLM-proposed grouping of a string field. Fields: field, new_field, llm_group_instruction.",
    "Unroll" -> "One doc per value of a multi-valued field. Fields: field.",
    "Math" -> "add/subtract/multiply/divide two number inputs. Returns a number.",
    "SummarizeData" -> "LLM answer synthesis over the inputs. Fields: question. Returns text.")

  val ExamplePlan: String =
    """{"query": "top 3 sources among English documents",
      | "result_node": 2,
      | "nodes": {
      |  "0": {"node_type": "QueryDatabase", "node_id": 0, "inputs": [],
      |        "index": "documents", "query": {"match": {"lang": "en"}}},
      |  "1": {"node_type": "TopK", "node_id": 1, "inputs": [0],
      |        "field": "properties.source", "K": 3, "descending": true, "llm_cluster": false},
      |  "2": {"node_type": "SummarizeData", "node_id": 2, "inputs": [1],
      |        "question": "top 3 sources among English documents"}}}""".stripMargin
}
