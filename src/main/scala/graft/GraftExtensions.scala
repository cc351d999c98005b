package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.gf
import graft.operators.{ColorHistogramExpr, DHashExpr}

/**
 * SQL surface for the graft function library.
 *
 * The reference has no SQL layer at all (every scalar lives inside a Python
 * transform); Spark gives us one for free once the expressions are in the
 * `FunctionRegistry`. Registering here means a SQL-only user — a BI tool, a
 * `spark.sql(...)` notebook, Thrift server — can call the same codegen'd
 * expressions the DocSet API uses, with identical semantics (one
 * implementation, two surfaces).
 *
 * Two entry points:
 *  - `GraftSqlFunctions.register(spark)` — add the functions to an existing
 *    session (idempotent; replaces prior registrations of the same name);
 *  - `class GraftExtensions` — the `spark.sql.extensions` /
 *    `.withExtensions` path, so a cluster config line enables the library
 *    for every session without code changes.
 *
 * All functions resolve to pure Catalyst expression trees (the same ones
 * `gf` builds for the Column API), so Catalyst folds/prunes/pushes them like
 * any built-in and whole-stage codegen applies unchanged.
 */
object GraftSqlFunctions {

  private type Builder = Seq[Expression] => Expression

  private def c(e: Expression): Column = ColumnBridge.column(e)

  /** Eagerly convert the Column tree to catalyst expressions.
    * `ColumnBridge.expression` (lazy `ColumnNodeExpression` wrapper) is fine
    * when a Dataset operation will run the converter later, but a
    * FunctionRegistry builder must hand the analyzer a plain catalyst tree —
    * the wrapper reports NullType during type-checks and kills codegen. */
  private def x(col: Column): Expression = ColumnBridge.eagerExpression(col)

  /** Scale knobs (shingle n, minhash k, LSH geometry) must be plan-time
    * constants — they pick an algorithm shape, not a per-row value. */
  private def longArg(fn: String, e: Expression): Long =
    if (!e.foldable) throw new IllegalArgumentException(s"$fn: argument must be a literal integer")
    else e.eval() match {
      case i: Int  => i.toLong
      case l: Long => l
      case other   => throw new IllegalArgumentException(s"$fn: expected integer literal, got $other")
    }

  private def intArg(fn: String, e: Expression): Int = {
    val l = longArg(fn, e)
    if (l < Int.MinValue || l > Int.MaxValue)
      throw new IllegalArgumentException(s"$fn: argument $l out of int range")
    l.toInt
  }

  private def strArg(fn: String, e: Expression): String =
    if (!e.foldable) throw new IllegalArgumentException(s"$fn: argument must be a literal string")
    else e.eval() match {
      case null  => throw new IllegalArgumentException(s"$fn: argument must not be NULL")
      case other => String.valueOf(other)
    }

  private def strArrayArg(fn: String, e: Expression): Seq[String] =
    if (!e.foldable) throw new IllegalArgumentException(s"$fn: argument must be a literal array")
    else e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map { i =>
          // a raw NPE from getUTF8String on array(..., NULL) would read as
          // an engine bug; fail like the other literal-arg helpers instead
          if (a.isNullAt(i))
            throw new IllegalArgumentException(s"$fn: array literal must not contain NULL")
          a.getUTF8String(i).toString
        }
      case other => throw new IllegalArgumentException(s"$fn: expected array literal, got $other")
    }

  private def arity(fn: String, n: Int)(b: Builder): Builder = es => {
    if (es.length != n)
      throw new IllegalArgumentException(s"$fn expects $n argument(s), got ${es.length}")
    b(es)
  }

  /** (name, usage, builder) for every registered SQL function. */
  val functions: Seq[(String, String, Builder)] = Seq(
    // tokens / shingles
    ("gf_tokens", "(text) -> array<string>",
      arity("gf_tokens", 1)(es => x(gf.tokens(c(es(0)))))),
    ("gf_token_count", "(text) -> int",
      arity("gf_token_count", 1)(es => x(gf.tokenCount(c(es(0)))))),
    ("gf_bpeish_token_count", "(text) -> int",
      arity("gf_bpeish_token_count", 1)(es => x(gf.bpeishTokenCount(c(es(0)))))),
    ("gf_word_shingles", "(text, n) -> array<string>",
      arity("gf_word_shingles", 2)(es =>
        x(gf.wordShingles(c(es(0)), intArg("gf_word_shingles", es(1)))))),
    ("gf_char_shingles", "(text, n) -> array<string>",
      arity("gf_char_shingles", 2)(es =>
        x(gf.charShingles(c(es(0)), intArg("gf_char_shingles", es(1)))))),
    // sketches
    ("gf_minhash", "(shingles, k) -> array<bigint>",
      arity("gf_minhash", 2)(es =>
        x(gf.minhashSignature(c(es(0)), intArg("gf_minhash", es(1)))))),
    ("gf_minhash_poly", "(shingles, k) -> array<bigint>",
      arity("gf_minhash_poly", 2)(es =>
        x(gf.minhashPoly(c(es(0)), intArg("gf_minhash_poly", es(1)))))),
    ("gf_lsh_bands", "(signature, bands, rowsPerBand) -> array<bigint>",
      arity("gf_lsh_bands", 3)(es =>
        x(gf.lshBandKeys(c(es(0)), intArg("gf_lsh_bands", es(1)), intArg("gf_lsh_bands", es(2)))))),
    ("gf_simhash64", "(text) -> bigint",
      arity("gf_simhash64", 1)(es => x(gf.simhash64(c(es(0)))))),
    ("gf_simhash_poly31", "(text) -> bigint",
      arity("gf_simhash_poly31", 1)(es => x(gf.simhashPoly31(c(es(0)))))),
    ("gf_hamming64", "(a, b) -> int",
      arity("gf_hamming64", 2)(es => x(gf.hamming64(c(es(0)), c(es(1)))))),
    ("gf_fingerprint64", "(text) -> bigint",
      arity("gf_fingerprint64", 1)(es => x(gf.fingerprint64(c(es(0)))))),
    ("gf_poly_fingerprint", "(text[, mult, mod]) -> bigint",
      es => es.length match {
        case 1 => x(gf.polyFingerprint(c(es(0))))
        case 3 => x(gf.polyFingerprint(c(es(0)),
          longArg("gf_poly_fingerprint", es(1)), longArg("gf_poly_fingerprint", es(2))))
        case n => throw new IllegalArgumentException(s"gf_poly_fingerprint expects 1 or 3 arguments, got $n")
      }),
    // vector kernels
    ("gf_dot", "(a, b) -> double",
      arity("gf_dot", 2)(es => x(gf.dotProduct(c(es(0)), c(es(1)))))),
    ("gf_l2_norm", "(a) -> double",
      arity("gf_l2_norm", 1)(es => x(gf.l2Norm(c(es(0)))))),
    ("gf_cosine", "(a, b) -> double",
      arity("gf_cosine", 2)(es => x(gf.cosineSimilarity(c(es(0)), c(es(1)))))),
    // quality signals
    ("gf_compression_ratio", "(text) -> double",
      arity("gf_compression_ratio", 1)(es => x(gf.compressionRatio(c(es(0)))))),
    ("gf_punct_count", "(text) -> int",
      arity("gf_punct_count", 1)(es => x(gf.punctCount(c(es(0)))))),
    ("gf_alpha_ratio", "(text) -> double",
      arity("gf_alpha_ratio", 1)(es => x(gf.alphaRatio(c(es(0)))))),
    ("gf_stopword_ratio", "(text) -> double",
      arity("gf_stopword_ratio", 1)(es => x(gf.stopwordRatio(c(es(0)))))),
    ("gf_mean_token_length", "(text) -> double",
      arity("gf_mean_token_length", 1)(es => x(gf.meanTokenLength(c(es(0)))))),
    ("gf_quality_score", "(text) -> double",
      arity("gf_quality_score", 1)(es => x(gf.qualityScore(c(es(0)))))),
    // the midpoint-safe cross-engine rounding (see gf.roundHalfUp): SQL
    // users writing oracled pipelines need the same primitive the engine's
    // own gates use — Spark's round(x, s>0) diverges from DuckDB at
    // shortest-repr decimal midpoints
    ("gf_round_half_up", "(x, scale) -> double",
      arity("gf_round_half_up", 2)(es =>
        x(gf.roundHalfUp(c(es(0)), intArg("gf_round_half_up", es(1)))))),
    ("gf_blocklist_hits", "(text, array('w1','w2',...)) -> int",
      arity("gf_blocklist_hits", 2)(es =>
        x(gf.blocklistHits(c(es(0)), strArrayArg("gf_blocklist_hits", es(1)))))),
    ("gf_nfc_normalize", "(text) -> string",
      arity("gf_nfc_normalize", 1)(es => x(gf.nfcNormalize(c(es(0)))))),
    ("gf_jaro_winkler", "(a, b) -> double",
      arity("gf_jaro_winkler", 2)(es => x(gf.jaroWinkler(c(es(0)), c(es(1)))))),
    ("gf_fix_mojibake", "(text) -> string",
      arity("gf_fix_mojibake", 1)(es => x(gf.fixMojibake(c(es(0)))))),
    ("gf_fix_mojibake_fixpoint", "(text) -> string",
      arity("gf_fix_mojibake_fixpoint", 1)(es => x(gf.fixMojibakeFixpoint(c(es(0)))))),
    ("gf_gopher_keep", "(text) -> boolean",
      arity("gf_gopher_keep", 1)(es => x(gf.gopherKeep(c(es(0)))))),
    ("gf_repetition_keep", "(text) -> boolean (Gopher A1.2)",
      arity("gf_repetition_keep", 1)(es => x(gf.repetitionKeepText(c(es(0)))))),
    ("gf_url_host", "(url) -> string",
      arity("gf_url_host", 1)(es => x(gf.urlHost(c(es(0)))))),
    ("gf_registered_domain", "(host) -> string (eTLD+1)",
      arity("gf_registered_domain", 1)(es => x(gf.registeredDomain(c(es(0)))))),
    ("gf_c4_clean", "(text) -> string",
      arity("gf_c4_clean", 1)(es => x(gf.c4CleanLines(c(es(0)))))),
    ("gf_c4_keep", "(text) -> boolean",
      arity("gf_c4_keep", 1)(es => x(gf.c4Keep(c(es(0)))))),
    ("gf_dedup_key", "(text) -> string",
      arity("gf_dedup_key", 1)(es => x(gf.dedupKey(c(es(0)))))),
    ("gf_chunk_tokens",
      "(text, maxTokens[, overlap]) -> array<string>; casing kept, whitespace runs collapse",
      es => es.length match {
        case 2 => x(gf.chunkTokens(c(es(0)), intArg("gf_chunk_tokens", es(1))))
        case 3 => x(gf.chunkTokens(c(es(0)), intArg("gf_chunk_tokens", es(1)),
          intArg("gf_chunk_tokens", es(2))))
        case n => throw new IllegalArgumentException(
          s"gf_chunk_tokens expects 2 or 3 arguments, got $n")
      }),
    ("gf_scrub_pii", "(text[, replacement]) -> string",
      es => es.length match {
        case 1 => x(gf.scrubPii(c(es(0))))
        case 2 => x(gf.scrubPii(c(es(0)), strArg("gf_scrub_pii", es(1))))
        case n => throw new IllegalArgumentException(s"gf_scrub_pii expects 1 or 2 arguments, got $n")
      }),
    ("gf_top_count", "(array<string>) -> int",
      arity("gf_top_count", 1)(es => x(gf.topCount(c(es(0)))))),
    ("gf_dup_line_fraction", "(text) -> double",
      arity("gf_dup_line_fraction", 1)(es => x(gf.dupLineFraction(c(es(0)))))),
    ("gf_langid", "(text) -> string",
      arity("gf_langid", 1)(es => x(gf.langId(c(es(0)))))),
    ("gf_canonicalize_url", "(url) -> string (dedup key: case/port/www/tracking/order/fragment collapse)",
      arity("gf_canonicalize_url", 1)(es => x(gf.canonicalizeUrl(c(es(0)))))),
    ("gf_luhn_valid", "(text) -> boolean",
      arity("gf_luhn_valid", 1)(es => x(gf.luhnValid(c(es(0)))))),
    ("gf_scrub_credit_cards", "(text[, replacement]) -> string",
      es => es.length match {
        case 1 => x(gf.scrubCreditCards(c(es(0))))
        case 2 => x(gf.scrubCreditCards(c(es(0)), strArg("gf_scrub_credit_cards", es(1))))
        case n => throw new IllegalArgumentException(
          s"gf_scrub_credit_cards expects 1 or 2 arguments, got $n")
      }),
    ("gf_readability", "(text) -> struct(n_words, n_sentences, n_syllables, fk_milli)",
      arity("gf_readability", 1)(es => x(gf.readabilityStats(c(es(0)))))),
    ("gf_fim", "(id, text) -> string (PSM fill-in-the-middle render)",
      arity("gf_fim", 2)(es => x(gf.fimTransform(c(es(0)), c(es(1)))))),
    ("gf_span_corrupt", "(id, text) -> struct(input, target, n_masked)",
      arity("gf_span_corrupt", 2)(es => x(gf.spanCorrupt(c(es(0)), c(es(1)))))),
    // multimodal
    ("gf_dhash", "(image_bytes) -> bigint",
      arity("gf_dhash", 1)(es => DHashExpr(es(0)))),
    ("gf_color_histogram", "(image_bytes) -> array<float>",
      arity("gf_color_histogram", 1)(es => ColorHistogramExpr(es(0)))))

  private[graft] def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.GraftSqlFunctions", null, name, s"_FUNC_$usage",
      "", "", "", "misc_funcs", "1.0.0", "", "built-in")

  /** Register every function on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info(name, usage), builder)
    }
}

/**
 * `spark.sql.extensions=graft.GraftExtensions` (or
 * `SparkSession.builder.withExtensions(new GraftExtensions)`): the
 * config-only path that makes the library's SQL functions available to every
 * session on a cluster.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSqlFunctions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), GraftSqlFunctions.info(name, usage), builder))
    }
}
