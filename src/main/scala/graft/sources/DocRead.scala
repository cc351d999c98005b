package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.docset.DocSet
import graft.model.Document

/**
 * Sources: files -> DocSet (reference: lib/sycamore/sycamore/reader.py +
 * connectors/file/file_scan.py). The reference hand-rolls recursive listing
 * and S3/local dispatch over pyarrow; Spark's binaryFile/json sources give
 * the same (plus partition parallelism, predicate pushdown on path/length,
 * and any Hadoop filesystem) for free.
 */
object DocRead {

  /** One Document per file, bytes in binary_representation, path metadata in
    * properties (reference: reader.py:46 read.binary, file_scan.py:156
    * BinaryScan). `binary_format` becomes docType; extension filtering via
    * pathGlobFilter pushes into the file listing. */
  def binary(spark: SparkSession, paths: String, binaryFormat: String): DocSet = {
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", s"*.$binaryFormat")
      .load(paths)
    binaryRowsToDocs(df, binaryFormat)
  }

  /** binaryFile-source rows -> binary Documents. ONE definition shared by
    * the batch scan above and streaming DocStream.binaryFileStream — the
    * streaming-twin parity test asserts identical per-document results,
    * which only holds if both paths run the same projection. */
  private[graft] def binaryRowsToDocs(df: DataFrame, binaryFormat: String): DocSet = {
    val ds = df.select(col("path"), col("content"), col("length"),
        col("modificationTime").cast("string").as("mtime"))
      .as[(String, Array[Byte], Long, String)](
        Encoders.product[(String, Array[Byte], Long, String)])
      .map { t: (String, Array[Byte], Long, String) =>
        val (path, content, len, mtime) = t
        Document.of(path, docType = binaryFormat,
            properties = Map("path" -> path, "filetype" -> binaryFormat,
              "file_size" -> len.toString, "file_mtime" -> mtime))
          .copy(binaryRepresentation = Some(content))
      }(DocSet.docEnc)
    DocSet.wrap(ds)
  }

  /** Binary scan + per-file metadata from a manifest map, joined on path
    * (reference: reader.py:94 read.manifest — JsonManifestMetadataProvider;
    * the manifest is small -> broadcast join by construction). */
  def manifest(spark: SparkSession, paths: String, binaryFormat: String,
               metadata: Map[String, Map[String, String]]): DocSet = {
    val meta = spark.sparkContext.broadcast(metadata)
    binary(spark, paths, binaryFormat).map { d =>
      meta.value.get(d.docId) match {
        case Some(m) => d.copy(properties = d.properties ++ m)
        case None => d
      }
    }
  }

  /** JSON/JSONL records -> Documents: every top-level field becomes a dotted
    * property (reference: reader.py:145 read.json, file_scan.py:291 JsonScan). */
  def json(spark: SparkSession, paths: String,
           docIdField: Option[String] = None,
           textField: Option[String] = None): DocSet = {
    val df = spark.read.json(paths)
    fromDataFrame(df, docIdField, textField)
  }

  /** Whole-FILE JSON -> Documents, the reference JsonScan's actual contract
    * (file_scan.py:291 + its test_file_scan.py cases): each file is ONE
    * JSON object. `properties` restricts which top-level keys become
    * document properties (default all); `bodyField` lifts one key to
    * text_representation; `rowsField` instead explodes an array-of-objects
    * field into one Document per element (the nested_json doc_extractor
    * pattern — HuggingFace datasets-server responses and friends). The
    * file path rides as docId and the `path` property, like read.binary.
    * Nested values stringify as JSON in the string-properties map (the
    * engine's uniform property representation — fromDataFrame's contract). */
  /** Existence test matching Spark's analyzer resolution: case-insensitive
    * unless spark.sql.caseSensitive is on — a plain `columns.contains`
    * would silently drop a requested key that select() itself resolves. */
  private def hasColumn(df: DataFrame, name: String): Boolean = {
    val cs = df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    if (cs) df.columns.contains(name)
    else df.columns.exists(_.equalsIgnoreCase(name))
  }

  /** Columnar lineage id for relational/columnar ingests: "lin-" +
    * hex(xxhash64(id)). Driver-built documents (Document.of, search hits)
    * use Document.lineageOf's murmur-base36 scheme instead — lineage ids
    * are per-document provenance handles, not cross-ingest-path join
    * keys; the columnar scheme exists because Scala's
    * MurmurHash3.stringHash has no Catalyst twin. */
  private def lineageCol(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("lin-"), lower(hex(xxhash64(id.cast("string")))))

  def jsonFile(spark: SparkSession, paths: String,
               properties: Option[Seq[String]] = None,
               bodyField: Option[String] = None,
               rowsField: Option[String] = None): DocSet = {
    // the injected file-URI column is named "path" (the read.binary
    // contract) UNLESS the data already carries that key — then the user's
    // field keeps its name/value and the URI rides as "_file_path" instead
    // of silently overwriting data (or colliding into an ambiguous-column
    // AnalysisException in rows mode)
    val raw0 = spark.read.option("multiLine", "true").json(paths)
    rowsField match {
      case Some(rf) =>
        // one Document per array element; docId = path#index so ids stay
        // unique across rows of the same file. posexplode_OUTER: a file
        // whose rowsField is null/absent-in-this-file must surface as ONE
        // marker document (rows_missing=true, all row fields null), not
        // silently contribute zero documents — whole-file loss with no
        // error is the failure mode this reader otherwise avoids
        val exploded = raw0
          .select(input_file_name().as("_file_uri"),
            posexplode_outer(col(rf)).as(Seq("_idx", "_row")))
          .select(
            concat(col("_file_uri"), lit("#"),
              coalesce(col("_idx").cast("string"), lit("norows"))).as("_rowid"),
            col("_file_uri"),
            when(col("_idx").isNull, lit("true")).as("rows_missing"),
            col("_row.*"))
        val fileProp = if (hasColumn(exploded, "path")) "_file_path" else "path"
        val labeled = exploded.withColumnRenamed("_file_uri", fileProp)
        // the property subset applies to ROW fields in this mode — a
        // requested restriction must not be silently dropped
        val kept = properties match {
          case Some(keys) =>
            // rows_missing survives a property restriction: the marker is
            // the only evidence a file contributed no rows
            labeled.select(
              (Seq("_rowid", fileProp, "rows_missing") ++ keys ++ bodyField.toSeq)
                .distinct.filter(hasColumn(labeled, _)).map(col): _*)
          case None => labeled
        }
        fromDataFrame(kept, docIdField = Some("_rowid"), textField = bodyField)
      case None =>
        val fileProp = if (hasColumn(raw0, "path")) "_file_path" else "path"
        val raw = raw0.withColumn(fileProp, input_file_name())
        val keep = properties match {
          case Some(keys) =>
            // same missing-key contract as rows mode: a requested key that
            // no file carries is dropped, not an AnalysisException that
            // fails the whole read (corpora are ragged; spark.read.json
            // only surfaces keys that appear somewhere)
            raw.select(((fileProp +: keys).distinct ++ bodyField.toSeq).distinct
              .filter(hasColumn(raw, _)).map(col): _*)
          case None => raw
        }
        fromDataFrame(keep, docIdField = Some(fileProp), textField = bodyField)
    }
  }

  /** Any DataFrame -> DocSet: columns flatten into dotted properties
    * (reference: reader.py:194-214 read.arrow/pandas/document — in-memory
    * tables as docs; here every Spark source qualifies).
    *
    * Built from PURE COLUMN EXPRESSIONS, no typed map: the Document row is a
    * relational projection, so Catalyst sees through it — a count() prunes
    * the whole conversion, `element_at(properties, k)` on the CreateMap
    * folds back to the raw column (SimplifyExtractValueOps), and predicates
    * on properties push down to the parquet scan. A Scala-lambda version
    * would wall off every downstream operator from the optimizer. */
  def fromDataFrame(df: DataFrame, docIdField: Option[String] = None,
                    textField: Option[String] = None): DocSet = {
    val cols = df.schema.fieldNames.toSeq
    val idCol = docIdField.getOrElse(cols.head)
    val docSchema = DocSet.docEnc.schema
    def nullOf(field: String) =
      lit(null).cast(docSchema(field).dataType).as(field)
    val ds = df.select(
      col(idCol).cast("string").as("docId"),
      lineageCol(col(idCol)).as("lineageId"),
      nullOf("docType"),
      textField.map(t => col(t).cast("string")).getOrElse(lit(null).cast("string"))
        .as("textRepresentation"),
      nullOf("binaryRepresentation"),
      // [] not null: the Seq encoder round-trips empty, not missing
      array().cast(docSchema("elements").dataType).as("elements"),
      // an array-typed `embedding` column passes through as the document
      // embedding (kmeans/clustering/ANN need it). equalsIgnoreCase: the
      // analyzer resolves case-insensitively by default, so an 'Embedding'
      // column would otherwise miss the promotion AND get stringified into
      // the properties map (double row width through every shuffle)
      (df.schema.find(f => f.name.equalsIgnoreCase("embedding") &&
          f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]) match {
        case Some(f) => col(f.name).cast("array<float>")
        case None => lit(null).cast(docSchema("embedding").dataType)
      }).as("embedding"),
      nullOf("shingles"),
      nullOf("parentId"),
      nullOf("bbox"),
      // CreateMap (not map_from_arrays): GetMapValue(CreateMap(...)) folds
      // back to the raw column, so property predicates reach the scan.
      // Column typing per kind:
      //  - the promoted embedding array is EXCLUDED — it already rides in the
      //    typed `embedding` column, and stringifying a 1536-dim float array
      //    into the map would double row width through every shuffle;
      //  - binary columns are EXCLUDED (opaque bytes have no string form);
      //  - other array/struct/map columns go through to_json (still a pure
      //    column expression) so multi-valued fields keep JSON fidelity
      //    instead of Spark's bracketed rendering;
      //  - scalars cast to string as before.
      propertiesMap(df, cols).as("properties"))
      .as[Document](DocSet.docEnc)
    DocSet.wrap(ds)
  }

  private def propertiesMap(df: DataFrame, cols: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    val pairs = cols.flatMap { c =>
      df.schema(c).dataType match {
        case BinaryType => Nil
        case _: ArrayType if c.equalsIgnoreCase("embedding") => Nil
        case _: ArrayType | _: StructType | _: MapType => Seq(lit(c), to_json(col(c)))
        case _ => Seq(lit(c), col(c).cast("string"))
      }
    }
    if (pairs.isEmpty) typedLit(Map.empty[String, String]) else map(pairs: _*)
  }

  /**
   * Relational source over JDBC — the read half of the reference's
   * relational connector (reader.py:377 read.duckdb: rows of a database
   * table become documents). The reference reads through a single-process
   * client; Spark-first this is `spark.read.jdbc`, which keeps the two
   * properties a large read needs:
   *   - '''pushdown''': pass a `(SELECT ...) t` subquery as `table` and the
   *     filter/projection runs IN the database — only the result crosses
   *     the wire;
   *   - '''partitioned read''': (partitionColumn, lowerBound, upperBound,
   *     numPartitions) splits the scan into range-disjoint WHERE clauses —
   *     N executors read concurrently, nothing passes through the driver.
   * Columns map to documents via [[fromDataFrame]] (any JDBC driver on the
   * classpath; tested against embedded Derby, like [[DocWrite.jdbc]]).
   */
  def jdbc(spark: SparkSession, url: String, table: String,
           docIdField: Option[String] = None, textField: Option[String] = None,
           partitionColumn: Option[String] = None,
           lowerBound: Long = 0L, upperBound: Long = 0L, numPartitions: Int = 1,
           properties: java.util.Properties = new java.util.Properties()): DocSet = {
    val df = partitionColumn match {
      case Some(pc) =>
        spark.read.jdbc(url, table, pc, lowerBound, upperBound, numPartitions, properties)
      case None => spark.read.jdbc(url, table, properties)
    }
    fromDataFrame(df, docIdField, textField)
  }

  /** Read back a [[DocWrite.jdbc]]-written table as typed documents:
    * doc_id/doc_type/text_representation/parent_id return to their fields
    * and properties_json re-inflates into the properties map — the
    * relational round trip (write.duckdb -> read.duckdb in the reference). */
  def jdbcMaterialized(spark: SparkSession, url: String, table: String,
                       properties: java.util.Properties = new java.util.Properties()): DocSet = {
    val docSchema = DocSet.docEnc.schema
    val ds = spark.read.jdbc(url, table, properties).select(
      col("doc_id").cast("string").as("docId"),
      lineageCol(col("doc_id")).as("lineageId"),
      col("doc_type").cast("string").as("docType"),
      col("text_representation").cast("string").as("textRepresentation"),
      lit(null).cast("binary").as("binaryRepresentation"),
      array().cast(docSchema("elements").dataType).as("elements"),
      lit(null).cast("array<float>").as("embedding"),
      lit(null).cast("array<bigint>").as("shingles"),
      col("parent_id").cast("string").as("parentId"),
      lit(null).cast(docSchema("bbox").dataType).as("bbox"),
      coalesce(
        from_json(col("properties_json"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")),
        typedLit(Map.empty[String, String])).as("properties"))
      .as[Document](DocSet.docEnc)
    DocSet.wrap(ds)
  }

  /** Read back a materialized DocSet (reference: reader.py:34
    * read.materialize over pickle dirs; ours is plain parquet of the
    * Document schema — splittable, columnar, predicate-pushable). */
  def materialized(spark: SparkSession, path: String): DocSet =
    DocSet.wrap(spark.read.parquet(path).as[Document](DocSet.docEnc))

  /** Read back an ORC-materialized DocSet (counterpart of
    * DocSet.writeOrc; same Document schema as the parquet path). */
  def orc(spark: SparkSession, path: String): DocSet =
    DocSet.wrap(spark.read.orc(path).as[Document](DocSet.docEnc))

  /** JSONL where each record is a serialized Document
    * (reference: reader.py:184 read.json_document, file_scan.py:398). */
  def jsonDocument(spark: SparkSession, paths: String): DocSet =
    DocSet.wrap(spark.read.schema(DocSet.docEnc.schema).json(paths)
      .as[Document](DocSet.docEnc))
}
