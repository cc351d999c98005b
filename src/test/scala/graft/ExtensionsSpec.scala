package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface (GraftExtensions / GraftSqlFunctions): same expressions, two
  * entry paths — post-hoc registry and spark.sql.extensions injection. */
class ExtensionsSpec extends AnyFunSuite {

  private def spark = SparkFixture.spark

  test("registered SQL functions agree with the Column API") {
    import graft.functions.gf
    import org.apache.spark.sql.functions._
    GraftSqlFunctions.register(spark)
    val df = spark.createDataFrame(Seq(
      (1, "the quick brown fox jumps over the lazy dog"),
      (2, "el perro y el gato en la casa"),
      (3, ""),
      (4, "a b a b a b"))).toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT id, gf_token_count(text) AS n, gf_langid(text) AS lang,
        |       gf_poly_fingerprint(text) AS fp, gf_quality_score(text) AS q,
        |       gf_simhash64(text) AS sh, size(gf_word_shingles(text, 2)) AS nsh,
        |       gf_dup_line_fraction(text) AS dlf
        |FROM ext_docs ORDER BY id""".stripMargin).collect()
    val viaCol = df.select(col("id"), gf.tokenCount(col("text")).as("n"),
        gf.langId(col("text")).as("lang"), gf.polyFingerprint(col("text")).as("fp"),
        gf.qualityScore(col("text")).as("q"),
        gf.simhash64(col("text")).as("sh"), size(gf.wordShingles(col("text"), 2)).as("nsh"),
        gf.dupLineFraction(col("text")).as("dlf"))
      .orderBy(col("id")).collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.map(_.getString(2)).toSeq == Seq("en", "es", "und", "en")) // "a" is an en stopword
  }

  test("luhn / readability / fim / span-corrupt callable from SQL, agree with Column API") {
    import graft.functions.gf
    import org.apache.spark.sql.functions._
    GraftSqlFunctions.register(spark)
    val df = spark.createDataFrame(Seq(
      (1L, "pay 4111-1111-1111-1111 now. The cat sat on the mat today ok."),
      (2L, "no cards here, just a plain sentence with several common words."))).toDF("id", "text")
    df.createOrReplaceTempView("ext_docs2")
    val viaSql = spark.sql(
      """SELECT id, gf_luhn_valid(text) AS lv, gf_scrub_credit_cards(text) AS sc,
        |       gf_readability(text).fk_milli AS fk, gf_fim(id, text) AS fim,
        |       gf_span_corrupt(id, text).n_masked AS nm
        |FROM ext_docs2 ORDER BY id""".stripMargin).collect()
    val viaCol = df.select(col("id"), gf.luhnValid(col("text")).as("lv"),
        gf.scrubCreditCards(col("text")).as("sc"),
        gf.readabilityStats(col("text")).getField("fk_milli").as("fk"),
        gf.fimTransform(col("id"), col("text")).as("fim"),
        gf.spanCorrupt(col("id"), col("text")).getField("n_masked").as("nm"))
      .orderBy(col("id")).collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql(0).getString(2).contains("[CC]"))
  }

  test("blocklist and nfc functions are callable from SQL") {
    GraftSqlFunctions.register(spark)
    val r = spark.sql(
      "SELECT gf_blocklist_hits('kick ass move on grass', array('ass', 'damn')) AS n, " +
      "gf_nfc_normalize('café') AS s").head
    assert(r.getInt(0) == 1) // "grass" is not a hit
    assert(r.getString(1) == "café")
  }

  test("NULL inside a literal-argument list is an informative error, not an NPE") {
    GraftSqlFunctions.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT gf_blocklist_hits('some text', array('a', NULL)) AS n").head)
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
        c.getMessage.contains("gf_blocklist_hits")),
      s"expected IllegalArgumentException naming the function, got: $e")
    assert(!chain(e).exists(_.isInstanceOf[NullPointerException]))
  }

  test("vector kernels are callable from SQL") {
    GraftSqlFunctions.register(spark)
    val r = spark.sql(
      """SELECT gf_dot(cast(array(1.0, 2.0, 3.0) AS array<double>),
        |              cast(array(4.0, 5.0, 6.0) AS array<double>)) AS d,
        |       round(gf_cosine(cast(array(1.0, 0.0) AS array<double>),
        |                       cast(array(1.0, 0.0) AS array<double>)), 6) AS c""".stripMargin).head
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 1.0)
  }

  test("poly_fingerprint accepts a modulus beyond Int range without truncation") {
    import graft.functions.gf
    import org.apache.spark.sql.functions._
    GraftSqlFunctions.register(spark)
    val mod = 4294967311L // prime > 2^32: silently truncating to int would corrupt it
    val viaSql = spark.sql(s"SELECT gf_poly_fingerprint('ab cd', 31, $mod) AS fp").head.getLong(0)
    val viaCol = spark.range(1)
      .select(gf.polyFingerprint(lit("ab cd"), 31L, mod).as("fp")).head.getLong(0)
    assert(viaSql == viaCol)
    // a plan-shape knob outside int range is an error, not a truncation
    val e = intercept[Exception](
      spark.sql("SELECT gf_word_shingles('a b', 4294967311)").collect())
    assert(e.getMessage.contains("out of int range"))
  }

  test("arity and literal-argument violations raise informative errors") {
    GraftSqlFunctions.register(spark)
    val e1 = intercept[Exception](spark.sql("SELECT gf_token_count('a', 'b')").collect())
    assert(e1.getMessage.contains("gf_token_count expects 1"))
    // shingle width must be a plan-time constant, not a per-row column
    spark.sql("SELECT 2 AS n, 'a b c' AS t").createOrReplaceTempView("ext_n")
    val e2 = intercept[Exception](
      spark.sql("SELECT gf_word_shingles(t, n + length(t)) FROM ext_n").collect())
    assert(e2.getMessage.toLowerCase.contains("literal"))
  }

  test("DESCRIBE FUNCTION shows registered usage") {
    GraftSqlFunctions.register(spark)
    val desc = spark.sql("DESCRIBE FUNCTION gf_langid").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("gf_langid"))
  }

  test("spark.sql.extensions injection path registers for new sessions") {
    val prev = spark // force fixture init so a SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne prev)
      val n = s2.sql("SELECT gf_bpeish_token_count('hi, there!') AS n").head.getInt(0)
      assert(n == 4) // hi | , | there | !
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
