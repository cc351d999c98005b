package graft.plan

import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * The logical query-plan layer: a JSON-serializable DAG of typed operator
 * nodes that an LLM planner emits and the executor lowers onto DocSet/Spark
 * pipelines (reference: lib/sycamore/sycamore/query/logical_plan.py:188
 * LogicalPlan — a pydantic node map with integer ids, input edges, a result
 * node, per-node cache keys; operator vocabulary in the query/operators dir).
 *
 * Design departures (Spark-first):
 *  - QueryDatabase targets a parquet table with a small match/range/bool
 *    filter DSL; the executor applies it on the DataFrame BEFORE converting
 *    to documents, so Catalyst pushes it into the parquet scan — the real
 *    version of the reference's prompt-level "fold filters into the source
 *    query" (reference: query_database.py:55, planner_prompt.py:38).
 *  - Values (query/start/end/default) are JSON values, mirroring pydantic's
 *    Any-typed fields.
 */
sealed trait QNode {
  def nodeId: Int
  def description: Option[String]
  def inputs: Seq[Int]
  final def nodeType: String = getClass.getSimpleName.stripPrefix("Q")

  /** Input/output typing contract (reference: logical_plan.py:84-92
    * input_types/output_type, validated by strategy.py:48 DefaultPlanValidator). */
  def inputTypes: Set[QType] = Set(QType.TDocSet)
  def outputType: QType = QType.TDocSet

  /** Operator payload fields, in stable order (for serialization + cache key). */
  def opFields: Seq[(String, JValue)]

  /** Fields excluded from logicalCompare (free-text prompts that don't change
    * plan shape; reference: json_schema_extra exclude_from_comparison). */
  def compareExcluded: Set[String] = Set.empty

  /** Semantic comparison ignoring node_id/description/prompt-text fields
    * (reference: logical_plan.py:107 logical_compare). */
  def logicalCompare(other: QNode): Boolean =
    nodeType == other.nodeType && inputs == other.inputs &&
      opFields.filterNot(f => compareExcluded(f._1)) ==
        other.opFields.filterNot(f => other.compareExcluded(f._1))
}

sealed trait QType
object QType {
  case object TDocSet extends QType
  case object TGrouped extends QType
  case object TNum extends QType
  case object TStr extends QType
}

import QType._

/** Load a parquet path as documents (reference: query_database.py DataLoader). */
final case class QDataLoader(nodeId: Int, description: Option[String], inputs: Seq[Int],
                             path: String) extends QNode {
  override def inputTypes: Set[QType] = Set.empty
  def opFields: Seq[(String, JValue)] = Seq("path" -> JString(path))
}

/** Scan a named table with an optional source-pushed filter DSL
  * (reference: query_database.py:11 QueryDatabase — OpenSearch DSL; ours is a
  * match/match_phrase/term/range/bool-must subset applied at the parquet scan). */
final case class QQueryDatabase(nodeId: Int, description: Option[String], inputs: Seq[Int],
                                index: String, query: Option[JValue]) extends QNode {
  override def inputTypes: Set[QType] = Set.empty
  def opFields: Seq[(String, JValue)] =
    Seq("index" -> JString(index), "query" -> query.getOrElse(JNothing))
}

/** Vector search: top-k rows of `index` by cosine between the embedded
  * query phrase and the table's embedding column (reference:
  * query_database.py:81 QueryVectorDatabase — delegated to an external
  * vector store there; self-contained ANN here). Approximate by design, so
  * plans should follow it with an LlmFilter (same guidance as the
  * reference); the analytics rewrite replaces it entirely
  * (RemoveVectorSearchForAnalytics). */
final case class QQueryVectorDatabase(nodeId: Int, description: Option[String], inputs: Seq[Int],
                                      index: String, queryPhrase: String,
                                      k: Int) extends QNode {
  override def inputTypes: Set[QType] = Set.empty
  def opFields: Seq[(String, JValue)] = Seq(
    "index" -> JString(index), "query_phrase" -> JString(queryPhrase), "K" -> JInt(k))
  override def compareExcluded: Set[String] = Set("query_phrase")
}

/** Range or match filter (reference: basic_filter.py:6; execution semantics
  * functions/basic_filters.py — substring match for strings, inclusive range,
  * optional date coercion). */
final case class QBasicFilter(nodeId: Int, description: Option[String], inputs: Seq[Int],
                              field: String, rangeFilter: Boolean, query: Option[JValue],
                              start: Option[JValue], end: Option[JValue],
                              isDate: Boolean) extends QNode {
  def opFields: Seq[(String, JValue)] = Seq(
    "field" -> JString(field), "range_filter" -> JBool(rangeFilter),
    "query" -> query.getOrElse(JNothing), "start" -> start.getOrElse(JNothing),
    "end" -> end.getOrElse(JNothing), "is_date" -> JBool(isDate))
}

/** LLM yes/no filter on a field (reference: llm_filter.py:6). */
final case class QLlmFilter(nodeId: Int, description: Option[String], inputs: Seq[Int],
                            field: String, question: String) extends QNode {
  def opFields: Seq[(String, JValue)] =
    Seq("field" -> JString(field), "question" -> JString(question))
  override def compareExcluded: Set[String] = Set("question")
}

/** LLM-extract a new field from an existing one (reference: llm_extract_entity.py:6). */
final case class QLlmExtractEntity(nodeId: Int, description: Option[String], inputs: Seq[Int],
                                   question: String, field: String, newField: String,
                                   newFieldType: String) extends QNode {
  def opFields: Seq[(String, JValue)] = Seq(
    "question" -> JString(question), "field" -> JString(field),
    "new_field" -> JString(newField), "new_field_type" -> JString(newFieldType))
  override def compareExcluded: Set[String] = Set("question", "new_field")
}

/** Count records, optionally distinct on a field (reference: count.py:6). */
final case class QCount(nodeId: Int, description: Option[String], inputs: Seq[Int],
                        distinctField: Option[String]) extends QNode {
  override def outputType: QType = TNum
  def opFields: Seq[(String, JValue)] =
    Seq("distinct_field" -> distinctField.map(JString(_)).getOrElse(JNothing))
}

/** Sort by field (reference: sort.py:6; missing-field docs are dropped when
  * no default is given — transforms/sort.py:12). */
final case class QSort(nodeId: Int, description: Option[String], inputs: Seq[Int],
                       field: String, descending: Boolean,
                       defaultValue: Option[JValue]) extends QNode {
  def opFields: Seq[(String, JValue)] = Seq(
    "field" -> JString(field), "descending" -> JBool(descending),
    "default_value" -> defaultValue.getOrElse(JNothing))
}

/** First-n limit (reference: limit.py). */
final case class QLimit(nodeId: Int, description: Option[String], inputs: Seq[Int],
                        numRecords: Int) extends QNode {
  def opFields: Seq[(String, JValue)] = Seq("num_records" -> JInt(numRecords))
}

/** Top-K most/least frequent values of a field; optional LLM normalization
  * (reference: top_k.py:8). K=None means all groups. */
final case class QTopK(nodeId: Int, description: Option[String], inputs: Seq[Int],
                       field: String, primaryField: Option[String], k: Option[Int],
                       descending: Boolean, llmCluster: Boolean,
                       llmClusterInstruction: Option[String]) extends QNode {
  def opFields: Seq[(String, JValue)] = Seq(
    "field" -> JString(field),
    "primary_field" -> primaryField.map(JString(_)).getOrElse(JNothing),
    "K" -> k.map(JInt(_)).getOrElse(JNothing),
    "descending" -> JBool(descending), "llm_cluster" -> JBool(llmCluster),
    "llm_cluster_instruction" -> llmClusterInstruction.map(JString(_)).getOrElse(JNothing))
  override def compareExcluded: Set[String] = Set("llm_cluster_instruction")
}

/** Semi-join: keep docs of input0 whose fieldOne value appears among input1's
  * fieldTwo values (reference: field_in.py; execution sycamore_operator.py:982). */
final case class QFieldIn(nodeId: Int, description: Option[String], inputs: Seq[Int],
                          fieldOne: String, fieldTwo: String) extends QNode {
  def opFields: Seq[(String, JValue)] =
    Seq("field_one" -> JString(fieldOne), "field_two" -> JString(fieldTwo))
}

/** Group docs by a field -> grouped handle (reference: groupby.py GroupBy). */
final case class QGroupBy(nodeId: Int, description: Option[String], inputs: Seq[Int],
                          field: String) extends QNode {
  override def outputType: QType = TGrouped
  def opFields: Seq[(String, JValue)] = Seq("field" -> JString(field))
}

/** Per-group count -> {properties.key, properties.count} docs
  * (reference: groupby.py AggregateCount). */
final case class QAggregateCount(nodeId: Int, description: Option[String],
                                 inputs: Seq[Int]) extends QNode {
  override def inputTypes: Set[QType] = Set(TGrouped)
  def opFields: Seq[(String, JValue)] = Seq.empty
}

/** Per-group collect into a summary doc (reference: groupby.py AggregateCollect). */
final case class QAggregateCollect(nodeId: Int, description: Option[String],
                                   inputs: Seq[Int]) extends QNode {
  override def inputTypes: Set[QType] = Set(TGrouped)
  def opFields: Seq[(String, JValue)] = Seq.empty
}

/** KMeans-cluster docs on the embedding column; assignment into newField
  * (reference: clustering.py KMeanClustering). */
final case class QKMeanClustering(nodeId: Int, description: Option[String], inputs: Seq[Int],
                                  field: Option[String], newField: String,
                                  k: Option[Int]) extends QNode {
  def opFields: Seq[(String, JValue)] = Seq(
    "field" -> field.map(JString(_)).getOrElse(JNothing),
    "new_field" -> JString(newField), "K" -> k.map(JInt(_)).getOrElse(JNothing))
}

/** LLM-proposed grouping of a string field; assignment into newField
  * (reference: clustering.py LLMClustering). */
final case class QLLMClustering(nodeId: Int, description: Option[String], inputs: Seq[Int],
                                field: String, newField: String,
                                llmGroupInstruction: Option[String]) extends QNode {
  def opFields: Seq[(String, JValue)] = Seq(
    "field" -> JString(field), "new_field" -> JString(newField),
    "llm_group_instruction" -> llmGroupInstruction.map(JString(_)).getOrElse(JNothing))
  override def compareExcluded: Set[String] = Set("llm_group_instruction")
}

/** One doc per value of a multi-valued field (reference: unroll.py). */
final case class QUnroll(nodeId: Int, description: Option[String], inputs: Seq[Int],
                         field: String) extends QNode {
  def opFields: Seq[(String, JValue)] = Seq("field" -> JString(field))
}

/** Arithmetic on two scalar inputs (reference: math.py; execution
  * operations.py math_operation — divide-by-zero yields NaN). */
final case class QMath(nodeId: Int, description: Option[String], inputs: Seq[Int],
                       operation: String) extends QNode {
  override def inputTypes: Set[QType] = Set(TNum)
  override def outputType: QType = TNum
  def opFields: Seq[(String, JValue)] = Seq("operation" -> JString(operation))
}

/** LLM answer synthesis over docsets/scalars (reference: summarize_data.py;
  * execution operations.py summarize_data). */
final case class QSummarizeData(nodeId: Int, description: Option[String], inputs: Seq[Int],
                                question: String) extends QNode {
  override def inputTypes: Set[QType] = Set(TDocSet, TNum, TStr)
  override def outputType: QType = TStr
  def opFields: Seq[(String, JValue)] = Seq("question" -> JString(question))
  override def compareExcluded: Set[String] = Set("question")
}

/**
 * A whole plan: node map + result node (reference: logical_plan.py:188).
 */
final case class QPlan(query: String, nodes: Map[Int, QNode], resultNode: Int) {

  def node(id: Int): QNode = nodes.getOrElse(id,
    throw new IllegalArgumentException(s"no node $id in plan"))

  def downstreamNodes(nodeId: Int): Seq[Int] =
    nodes.collect { case (id, n) if n.inputs.contains(nodeId) => id }.toSeq.sorted

  /** Type-check every edge (reference: strategy.py:48 DefaultPlanValidator),
    * PLUS input arity: a type-valid plan with the wrong input COUNT
    * (Math with one input, Count with none) would otherwise pass here and
    * crash deep inside eval with an opaque IndexOutOfBounds AFTER the
    * upstream work already ran — and past the planner's retry loop, which
    * can only repair failures raised at plan time. */
  def validate(): Unit = {
    val errors = scala.collection.mutable.ListBuffer[String]()
    if (!nodes.contains(resultNode)) errors += s"result_node $resultNode not in plan"
    nodes.foreach { case (id, n) =>
      n.inputs.foreach { dep =>
        nodes.get(dep) match {
          case None => errors += s"node $id (${n.nodeType}): missing input $dep"
          case Some(d) if !n.inputTypes.contains(d.outputType) =>
            errors += s"node $id (${n.nodeType}): invalid input type ${d.outputType} " +
              s"from node $dep (${d.nodeType}); supported: ${n.inputTypes}"
          case _ =>
        }
      }
      val arity: Option[(Int, Int)] = n match { // (min, max) inputs
        case _: QDataLoader | _: QQueryDatabase | _: QQueryVectorDatabase =>
          Some((0, 0))
        case _: QMath | _: QFieldIn => Some((2, 2))
        case _: QSummarizeData => Some((1, Int.MaxValue))
        case _ => Some((1, 1)) // every remaining operator is unary
      }
      arity.foreach { case (lo, hi) =>
        if (n.inputs.size < lo || n.inputs.size > hi)
          errors += s"node $id (${n.nodeType}): needs " +
            (if (lo == hi) s"$lo input(s)" else s"$lo..${if (hi == Int.MaxValue) "N" else hi} inputs") +
            s", got ${n.inputs.size}"
      }
    }
    // cycle check via DFS
    val state = scala.collection.mutable.Map[Int, Int]() // 0 unseen 1 visiting 2 done
    def dfs(id: Int): Unit = state.getOrElse(id, 0) match {
      case 1 => errors += s"cycle through node $id"
      case 2 =>
      case _ =>
        state(id) = 1
        nodes.get(id).toSeq.flatMap(_.inputs).foreach(dfs)
        state(id) = 2
    }
    nodes.keys.foreach(dfs)
    if (errors.nonEmpty)
      throw new IllegalArgumentException("invalid plan:\n" + errors.mkString("\n"))
  }

  /** Structural + data comparison (reference: logical_plan.py compare). */
  def logicalCompare(other: QPlan): Boolean =
    nodes.keySet == other.nodes.keySet && resultNode == other.resultNode &&
      nodes.forall { case (id, n) => n.logicalCompare(other.nodes(id)) }

  /** Replace a node in place, keeping edges (reference: logical_plan.py:252). */
  def replaceNode(nodeId: Int, newNode: QNode): QPlan = {
    require(newNode.nodeId == nodeId, "replacement must keep the node id")
    val patched = QPlanJson.withInputs(newNode, nodes(nodeId).inputs)
    copy(nodes = nodes.updated(nodeId, patched))
  }

  /** Insert a node before `nodeId`, shifting later ids right
    * (reference: logical_plan.py:269 insert_node, including its
    * precondition: the displaced node must have exactly ONE input —
    * silently rewiring a multi-input node would sever its other edges).
    * Appending (nodeId == max+1) wires the new node onto the current
    * result node. */
  def insertNode(nodeId: Int, newNode: QNode): QPlan = {
    // nodeId == 0 is allowed: an unconventionally numbered but DAG-valid
    // plan can put a single-input operator at id 0 (LimitLlmOperations
    // must be able to guard it); the single-input require below is the
    // real safety condition — a true source (zero inputs) still rejects.
    if (!nodes.contains(nodeId)) {
      val wired = QPlanJson.withMeta(newNode, nodeId, Seq(resultNode))
      copy(nodes = nodes.updated(nodeId, wired), resultNode = nodeId)
    } else {
      require(nodes(nodeId).inputs.size == 1,
        s"insertNode target $nodeId must have exactly one input, " +
          s"has ${nodes(nodeId).inputs}")
      val shifted = nodes.map { case (id, n) =>
        val nid = if (id >= nodeId) id + 1 else id
        val nin = n.inputs.map(i => if (i >= nodeId) i + 1 else i)
        nid -> QPlanJson.withMeta(n, nid, nin)
      }
      val target = shifted(nodeId + 1)
      val wired = QPlanJson.withMeta(newNode, nodeId, target.inputs)
      val retargeted = QPlanJson.withMeta(target, nodeId + 1, Seq(nodeId))
      copy(
        nodes = shifted.updated(nodeId, wired).updated(nodeId + 1, retargeted),
        resultNode = if (resultNode >= nodeId) resultNode + 1 else resultNode)
    }
  }

  /** Per-node content hash over the subtree, excluding ids/descriptions —
    * the intermediate-result cache key (reference: logical_plan.py:131-148).
    * Salted with [[QPlan.CacheFormatVersion]]: markers written under an
    * older caching guard (e.g. before TopK/QueryVectorDatabase were marked
    * order-sensitive) must not be trusted by newer builds, and content alone
    * cannot distinguish them. */
  def cacheKey(nodeId: Int): String = {
    def cacheDict(id: Int): JValue = {
      val n = node(id)
      JObject(
        ("node_type" -> JString(n.nodeType)) +:
        n.opFields.filterNot(_._2 == JNothing).toList :+
        ("inputs" -> JArray(n.inputs.map(cacheDict).toList)))
    }
    val canonical = QPlan.CacheFormatVersion +
      JsonMethods.compact(JsonMethods.render(cacheDict(nodeId)))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(canonical.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def toJson: String = QPlanJson.write(this)
}

object QPlan {
  /** Bump whenever the executor's cacheability guard changes meaning —
    * entries written under an older guard version then miss instead of
    * being trusted (v2: TopK/QueryVectorDatabase excluded as order-lossy;
    * v3: only expensive LLM/ML operators cache, and paths carry a source
    * -data fingerprint). */
  val CacheFormatVersion = "v3:"

  def fromJson(json: String): QPlan = QPlanJson.parse(json)
}

/** JSON (de)serialization in the reference's wire shape:
  * {"query":..., "result_node":N, "nodes":{"0":{"node_type":...,...}}}. */
object QPlanJson {

  def parse(json: String): QPlan = {
    val root = JsonMethods.parse(json)
    val query = str(root \ "query").getOrElse("")
    val resultNode = int(root \ "result_node").getOrElse(
      throw new IllegalArgumentException("plan missing result_node"))
    val nodes = (root \ "nodes") match {
      case JObject(fields) => fields.map { case (k, v) => k.toInt -> parseNode(v) }.toMap
      case other => throw new IllegalArgumentException(s"plan nodes must be an object, got $other")
    }
    QPlan(query, nodes, resultNode)
  }

  def parseNode(j: JValue): QNode = {
    val id = int(j \ "node_id").getOrElse(
      throw new IllegalArgumentException("node missing node_id"))
    val desc = str(j \ "description")
    val ins = (j \ "inputs") match {
      case JArray(xs) => xs.flatMap(int)
      case _ => Nil
    }
    def s(f: String): String = str(j \ f).getOrElse(
      throw new IllegalArgumentException(s"node $id missing field $f"))
    def sOpt(f: String): Option[String] = str(j \ f)
    def b(f: String, dflt: Boolean = false): Boolean = (j \ f) match {
      case JBool(v) => v
      case _ => dflt
    }
    def v(f: String): Option[JValue] = (j \ f) match {
      case JNothing | JNull => None
      case other => Some(other)
    }
    str(j \ "node_type").getOrElse(
      throw new IllegalArgumentException(s"node $id missing node_type")) match {
      case "DataLoader" => QDataLoader(id, desc, ins, s("path"))
      case "QueryDatabase" => QQueryDatabase(id, desc, ins, s("index"), v("query"))
      case "QueryVectorDatabase" => QQueryVectorDatabase(id, desc, ins, s("index"),
        s("query_phrase"), int(j \ "K").getOrElse(10))
      case "BasicFilter" => QBasicFilter(id, desc, ins, s("field"), b("range_filter"),
        v("query"), v("start"), v("end"), b("is_date"))
      case "LlmFilter" => QLlmFilter(id, desc, ins, s("field"), s("question"))
      case "LlmExtractEntity" => QLlmExtractEntity(id, desc, ins, s("question"),
        s("field"), s("new_field"), s("new_field_type"))
      case "Count" => QCount(id, desc, ins, sOpt("distinct_field"))
      case "Sort" => QSort(id, desc, ins, s("field"), b("descending"), v("default_value"))
      case "Limit" => QLimit(id, desc, ins, int(j \ "num_records").getOrElse(
        throw new IllegalArgumentException(s"node $id missing num_records")))
      case "TopK" => QTopK(id, desc, ins, s("field"), sOpt("primary_field"),
        int(j \ "K"), b("descending"), b("llm_cluster"), sOpt("llm_cluster_instruction"))
      case "FieldIn" => QFieldIn(id, desc, ins, s("field_one"), s("field_two"))
      case "GroupBy" => QGroupBy(id, desc, ins, s("field"))
      case "AggregateCount" => QAggregateCount(id, desc, ins)
      case "AggregateCollect" => QAggregateCollect(id, desc, ins)
      case "KMeanClustering" => QKMeanClustering(id, desc, ins, sOpt("field"),
        sOpt("new_field").getOrElse("centroids"), int(j \ "K"))
      case "LLMClustering" => QLLMClustering(id, desc, ins, s("field"),
        sOpt("new_field").getOrElse("_autogen_ClusterAssignment"),
        sOpt("llm_group_instruction"))
      case "Unroll" => QUnroll(id, desc, ins, s("field"))
      case "Math" => QMath(id, desc, ins, s("operation"))
      case "SummarizeData" => QSummarizeData(id, desc, ins, s("question"))
      case other => throw new IllegalArgumentException(s"unknown node type: $other")
    }
  }

  def nodeJson(n: QNode): JValue = JObject(
    List(
      "node_type" -> JString(n.nodeType),
      "node_id" -> JInt(n.nodeId),
      "inputs" -> JArray(n.inputs.map(i => JInt(i)).toList)) ++
    n.description.map(d => "description" -> JString(d)).toList ++
    n.opFields.filterNot(_._2 == JNothing).toList)

  def write(p: QPlan): String = {
    val j = JObject(
      "query" -> JString(p.query),
      "result_node" -> JInt(p.resultNode),
      "nodes" -> JObject(p.nodes.toList.sortBy(_._1)
        .map { case (id, n) => id.toString -> nodeJson(n) }))
    JsonMethods.compact(JsonMethods.render(j))
  }

  /** Rebuild a node with new meta (id/inputs); payload preserved via JSON
    * round-trip to avoid a 17-way copy() match. */
  def withMeta(n: QNode, nodeId: Int, inputs: Seq[Int]): QNode = {
    // no json4s `merge` here: merging two JArrays CONCATENATES them
    val JObject(fields) = nodeJson(n): @unchecked
    val patched = JObject(
      fields.filterNot(f => f._1 == "node_id" || f._1 == "inputs") ++
        List("node_id" -> JInt(nodeId),
             "inputs" -> JArray(inputs.map(i => JInt(i)).toList)))
    parseNode(patched)
  }

  def withInputs(n: QNode, inputs: Seq[Int]): QNode = withMeta(n, n.nodeId, inputs)

  private def str(j: JValue): Option[String] = j match {
    case JString(s) => Some(s)
    case _ => None
  }
  private def int(j: JValue): Option[Int] = j match {
    case JInt(v) => Some(v.toInt)
    case JLong(v) => Some(v.toInt)
    case JDouble(v) if v.isWhole => Some(v.toInt)
    case _ => None
  }
}
