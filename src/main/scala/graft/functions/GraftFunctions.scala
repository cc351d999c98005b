package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Column-level function library. Everything here is composed from Spark's
 * built-in (whole-stage-codegen'd) functions — no Scala/Python UDFs — so the
 * hot path stays inside Tungsten at any scale.
 *
 * Covers the reference's scalar-function surface (tokenizers
 * functions/tokenizer.py:6-58, simhash/shingles functions/simhash.py,
 * transforms/sketcher.py:29) plus the training-data-pipeline functions
 * (language id, quality scoring, token counting, fingerprinting,
 * vector similarity) that a 100 TB corpus pipeline needs.
 */
object gf {

  // ---------------------------------------------------------------- tokens

  /** Whitespace tokenizer (reference: functions/tokenizer.py CharacterTokenizer
    * counterpart is trivial; this is the standard word tokenizer). */
  def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** Per-text count substrate shared by tokenCount / punctCount /
    * alphaRatio / stopwordRatio / meanTokenLength / qualityScore — one
    * codegen'd pass; repeated uses over the same column collapse via
    * subexpression elimination (see TextStatsExpr). */
  private def textStats(c: Column): Column = fromExpr(TextStatsExpr(toExpr(c)))

  /** Whitespace token count (single-pass; same value as
    * size(split(trim(lower(c)), "\\s+")) with the empty-text guard). */
  def tokenCount(c: Column): Column =
    textStats(c).getField("n_tokens").cast("int")

  /** BPE-ish token count: words and punctuation runs counted separately,
    * approximating a subword tokenizer's granularity without a vocab.
    * Single-pass count — no per-row match-array materialization
    * (see BpeishCountExpr). */
  def bpeishTokenCount(c: Column): Column =
    fromExpr(BpeishCountExpr(toExpr(c)))

  /** Word n-gram shingles: array of space-joined n-token windows. Short texts
    * (< n tokens) yield one shingle of all tokens. Single-pass expression —
    * see WordShinglesExpr for why the HOF formulation was O(len²). */
  def wordShingles(c: Column, n: Int): Column =
    fromExpr(WordShinglesExpr(toExpr(tokens(c)), n))

  /** Clipped multiset overlap Σ_x min(count_a(x), count_b(x)) — the
    * ROUGE-N numerator. One codegen'd hash pass; see ClippedOverlapExpr. */
  def clippedOverlap(a: Column, b: Column): Column =
    fromExpr(ClippedOverlapExpr(toExpr(a), toExpr(b)))

  /** Jaro-Winkler similarity (Winkler prefix boost over Jaro; DuckDB-
    * bit-identical semantics — see JaroWinklerExpr). */
  def jaroWinkler(a: Column, b: Column): Column =
    fromExpr(JaroWinklerExpr(toExpr(a), toExpr(b)))

  /** Word n-gram shingles over an ALREADY-TOKENIZED array (wordShingles
    * minus the tokenize step) — for callers that need several n over the
    * same token array without re-splitting the text per order. */
  def tokenShingles(tokens: Column, n: Int): Column =
    fromExpr(WordShinglesExpr(toExpr(tokens), n))

  /** chrF per-order stats [o_n, ng_n, nr_n]*maxN in one row-local pass
    * (see ChrfStatsExpr). Inputs should be pre-stripped/lowered. */
  def chrfStats(a: Column, b: Column, maxN: Int): Column =
    fromExpr(ChrfStatsExpr(toExpr(a), toExpr(b), maxN))

  /** Character n-gram shingles over the lowercased text. Single-pass
    * codegen'd expression — the transform(sequence(...)) form ran
    * interpreted and cost 5.6 s of the chrF gate (see CharShinglesExpr;
    * contract unchanged: short texts yield one whole-string shingle). */
  def charShingles(c: Column, n: Int): Column =
    fromExpr(CharShinglesExpr(toExpr(lower(c)), n))

  // ------------------------------------------------------------ sketches

  private def fromExpr(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(e)
  private def toExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  /**
   * MinHash signature: k independent min-hashes over the shingle set
   * (reference computes 16 minhashes over rolling-window hashes,
   * functions/simhash.py:84-133, transforms/sketcher.py:29).
   *
   * Custom Catalyst expression, not a functions._ composition: k separate
   * `array_min(transform(...))` columns would re-evaluate the shingle
   * subexpression k times after CollapseProject and blow the plan out of
   * codegen (measured 45x at sf0.1). See SketchExpressions.scala.
   */
  def minhashSignature(shingles: Column, k: Int): Column =
    fromExpr(MinHashSignatureExpr(toExpr(shingles), k))

  /** Polynomial-hash MinHash signature — exactly replicable in the DuckDB
    * oracle (see MinHashPolyExpr); production stays minhashSignature. */
  def minhashPoly(shingles: Column, k: Int): Column =
    fromExpr(MinHashPolyExpr(toExpr(shingles), k))

  /**
   * LSH band keys for a minhash signature: split the signature into `bands`
   * bands of `rowsPerBand` and hash each band. Docs sharing any band key are
   * near-duplicate candidates — the scalable replacement for the reference's
   * single-actor O(n^2) SketchUniquify (transforms/sketcher.py:64-90).
   */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    fromExpr(LshBandKeysExpr(toExpr(signature), bands, rowsPerBand))

  /**
   * 64-bit SimHash over tokens (reference: functions/simhash.py).
   * bit_i(doc) = sign( sum_tokens(+1 if bit_i(hash(t)) else -1) ).
   * Single-pass custom expression (64 composed folds would duplicate the
   * token array evaluation 64x — same rationale as minhashSignature).
   */
  def simhash64(c: Column): Column =
    fromExpr(SimHash64Expr(toExpr(tokens(c))))

  /** 31-bit SimHash over polynomial token hashes — weaker mixing than
    * simhash64, but exactly replicable in the DuckDB oracle (see
    * SimHashPolyExpr). */
  def simhashPoly31(c: Column): Column =
    fromExpr(SimHashPolyExpr(toExpr(tokens(c))))

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * Rolling polynomial fingerprint of the full text (document fingerprinting;
   * Rabin-Karp-style as in reference functions/simhash.py:28-60) — stable
   * 64-bit content id, cheaper than md5 for dedup keys.
   */
  def fingerprint64(c: Column): Column =
    aggregate(
      split(c, ""),
      lit(0L),
      (acc, ch) => acc * lit(1000003L) + ascii(ch).cast("long"))

  /** Modular rolling fingerprint as ONE codegen'd expression — semantically
    * identical to `aggregate(split(c,""), ...)` with (acc*mult+cp) % mod,
    * minus the per-character array materialization (see PolyFingerprintExpr). */
  def polyFingerprint(c: Column, mult: Long = 31L, mod: Long = 1000000007L): Column =
    fromExpr(PolyFingerprintExpr(toExpr(c), mult, mod))

  // ------------------------------------------------------------- vectors

  /** Dot product of two numeric array columns (double math, left fold —
    * deterministic order). One codegen'd expression; see DotProductExpr for
    * why the aggregate(zip_with(...)) formulation was the hot-path cost. */
  def dotProduct(a: Column, b: Column): Column =
    fromExpr(DotProductExpr(toExpr(a), toExpr(b)))

  /** L2 norm of a numeric array column. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity of two numeric array columns. Zero-norm vectors
    * (possible for degenerate real-corpus chunks under a signed hash
    * embedder) score 0.0 instead of tripping ANSI divide-by-zero. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dotProduct(a, b) / denom)
  }

  /** Deflate compression ratio (compressed/raw bytes) — the repetition/
    * junk quality signal; see CompressionRatioExpr. Typical prose ~0.3-0.6;
    * cut both tails. */
  def compressionRatio(c: Column): Column =
    fromExpr(CompressionRatioExpr(toExpr(c)))

  // -------------------------------------------------------- text quality

  // POSIX punct class (\p{Punct} = [[:punct:]] in RE2): counted inside
  // TextStatsExpr with the exact same ASCII ranges, which keeps DuckDB
  // oracles bit-identical.

  /** Count of punctuation characters (single-pass, regex-free). */
  def punctCount(c: Column): Column =
    textStats(c).getField("n_punct").cast("int")

  /** Fraction of characters that are alphabetic ([a-zA-Z]). */
  def alphaRatio(c: Column): Column = {
    val st = textStats(c)
    when(st.getField("n_chars") === 0, lit(0.0)).otherwise(
      st.getField("n_alpha").cast("double") / st.getField("n_chars"))
  }

  /** English stopwords used by the heuristics below. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "that", "this", "be")

  /** Fraction of tokens that are stopwords (quality signal). The default
    * English list runs single-pass via TextStatsExpr; a custom list keeps
    * the composable (lambda) form. */
  def stopwordRatio(c: Column, stopwords: Seq[String] = EnglishStopwords): Column =
    if (stopwords == EnglishStopwords) {
      val st = textStats(c)
      when(st.getField("n_tokens") === 0, lit(0.0)).otherwise(
        st.getField("stop_hits").cast("double") / st.getField("n_tokens"))
    } else {
      // lowercase the caller's list like blocklistHits does — tokens()
      // lowercases the text, so 'The' in a raw list could never match;
      // and count only NONEMPTY tokens, so leading non-space whitespace
      // (split's leading-empty artifact) can't deflate the ratio
      val ts = filter(tokens(c), t => t =!= "")
      val lowered = stopwords.map(_.toLowerCase).distinct
      when(size(ts) === 0, lit(0.0)).otherwise(
        size(filter(ts, t => t.isin(lowered: _*))).cast("double") / size(ts))
    }

  /** Mean whitespace-token length in characters (single-pass). */
  def meanTokenLength(c: Column): Column = {
    val st = textStats(c)
    when(st.getField("n_tokens") === 0, lit(0.0)).otherwise(
      st.getField("char_sum").cast("double") / st.getField("n_tokens"))
  }

  /**
   * Cross-engine midpoint-safe rounding: floor(x·10^s + 0.5)/10^s. NEVER use
   * Spark's round(c, s>0) in an oracled result column: Spark rounds the
   * double's SHORTEST decimal representation (BigDecimal.valueOf) half-up
   * while DuckDB multiplies-and-rounds — a value whose shortest repr is an
   * exact scale-(s+1) midpoint (common for ratios of small integers, e.g.
   * 0.5118375) rounds UP in Spark and DOWN in DuckDB, the ±1e-6 divergence
   * the round-19 sf0.1 hash sweep caught on q_quality_score row 1388. This
   * form applies identical IEEE ops to the identical double in both engines
   * (SQL twin: floor((x) * 1e6 + 0.5) / 1e6), so the result is bit-equal by
   * construction — the sq8Encode floor(v + 0.5) discipline, generalized.
   * Scale-0 round() stays safe (shortest-repr round-trips preserve order
   * around integral midpoints) and is not swept.
   */
  def roundHalfUp(c: Column, scale: Int): Column = {
    // enforced, not just documented (r20, ADVICE): 10^s is an exact double
    // only for s <= 15, and gf_round_half_up exposes this to arbitrary
    // SQL-supplied scales — an out-of-contract scale must fail loudly, not
    // quietly void the bit-equality-with-DuckDB guarantee
    require(scale >= 0 && scale <= 15,
      s"roundHalfUp: scale must be in [0, 15] (10^s exactness bound), got $scale")
    val p = math.pow(10, scale)
    // floor via FloorDoubleExpr, NOT Spark's floor(): that returns BIGINT
    // and overflows at |x·10^s| > 2^63 (q_moments' m2 ~9.3e12 × 1e6
    // clamped to Long.Max). And not the algebraic y − pmod(y, 1) twin:
    // it references the input twice, and FilterExec codegen has no
    // subexpression elimination — a predicate over roundHalfUp(heavy
    // blend) re-evaluated the blend per reference (+60% on
    // q_weighted_sample). Math.floor matches DuckDB's double-returning
    // floor() bit-for-bit at every magnitude.
    fromExpr(FloorDoubleExpr(toExpr(c.cast("double") * lit(p) + lit(0.5)))) / lit(p)
  }

  /**
   * Composite document-quality score in [0,1]: blends length, alpha ratio,
   * stopword presence, and punctuation density — the usual pre-training
   * corpus filters (C4/Gopher-style rules), deterministic and codegen'd.
   */
  def qualityScore(c: Column): Column = {
    val lenScore  = least(length(c).cast("double") / 500.0, lit(1.0))
    val alpha     = alphaRatio(c)
    val stopwords = least(stopwordRatio(c) * 5.0, lit(1.0))
    val punctPenalty = least(punctCount(c).cast("double") /
      greatest(length(c), lit(1)).cast("double") * 4.0, lit(1.0))
    graft.functions.gf.roundHalfUp((lenScore * 0.3 + alpha * 0.3 + stopwords * 0.3 + (lit(1.0) - punctPenalty) * 0.1), 6)
  }

  /** Unicode NFC normalization (codegen'd; fast no-op path for text that
    * is already composed — see NfcNormalizeExpr). */
  def nfcNormalize(c: Column): Column = fromExpr(NfcNormalizeExpr(toExpr(c)))

  /** The Gopher (Rae et al. 2021, Appendix A1.1) per-document quality
    * counts as ONE codegen'd pass — word/line/symbol/stopword statistics
    * as exact integers (see GopherStatsExpr for the shared cross-engine
    * semantics). */
  def gopherStats(c: Column): Column = fromExpr(GopherStatsExpr(toExpr(c)))

  /** The Gopher keep-decision from the published thresholds, as PURE
    * INTEGER comparisons on gopherStats fields (no float ratios, so the
    * DuckDB oracle matches bit-for-bit): 50 <= words <= 100k; mean word
    * length in [3,10]; '#' and '...' symbol-to-word ratios <= 0.1;
    * <= 90% bullet-started lines; <= 30% ellipsis-ended lines; >= 80%
    * of words contain a letter; >= 2 distinct members of the 8-word
    * stop list. */
  def gopherKeep(c: Column): Column = {
    val st = gopherStats(c)
    def f(n: String) = st.getField(n)
    (f("n_words") >= 50L) && (f("n_words") <= 100000L) &&
      (f("word_char_sum") >= f("n_words") * 3L) &&
      (f("word_char_sum") <= f("n_words") * 10L) &&
      (f("n_hash") * 10L <= f("n_words")) &&
      (f("n_ellipsis") * 10L <= f("n_words")) &&
      (f("n_bullet_lines") * 10L <= f("n_lines") * 9L) &&
      (f("n_ellipsis_lines") * 10L <= f("n_lines") * 3L) &&
      (f("n_alpha_words") * 5L >= f("n_words") * 4L) &&
      (f("n_stop_distinct") >= 2L)
  }

  /** C4 stats substrate (single-pass; see C4StatsExpr — the keep decision
    * reads the cleaned text three ways, and a lambda-bearing Column
    * subtree would re-clean the document each time). */
  private def c4Stats(c: Column): Column = fromExpr(C4StatsExpr(toExpr(c)))

  /** C4 line cleaning (Raffel et al. 2020 §2.2): keep only lines that end
    * in a terminal punctuation mark (. ! ? or closing quote, with
    * trailing spaces allowed), carry >= 5 whitespace words, and do not
    * mention javascript; survivors re-join with newlines. The terminal
    * check is \z-style (absolute end) — Java's $ also matches before a
    * trailing \r, RE2's does not, and the oracle must agree on
    * \r-terminated lines. */
  def c4CleanLines(c: Column): Column = c4Stats(c).getField("clean_text")

  /** The C4 page keep-decision: the cleaned text retains >= 3 sentences
    * (terminal punctuation marks), and the RAW page contains neither a
    * curly brace (code) nor "lorem ipsum" (boilerplate). Shares ONE
    * C4StatsExpr evaluation with c4CleanLines under CSE. */
  def c4Keep(c: Column): Column = {
    val st = c4Stats(c)
    (length(st.getField("clean_text")) > 0) &&
      (st.getField("n_sentences") >= 3) &&
      (instr(c, "{") === 0) && (instr(lower(c), "lorem ipsum") === 0)
  }

  /** ftfy-style mojibake repair: UTF-8 sequences that were re-decoded as
    * Windows-1252 (cafÃ© -> café, â€™ -> ’) fixed via the shared ordered
    * mapping table; clean text takes an allocation-free fast path. The
    * standard pre-quality-scoring cleanup of web-crawl corpora (see
    * FixMojibakeExpr; the DuckDB oracle derives from the SAME table). */
  def fixMojibake(c: Column): Column = fromExpr(FixMojibakeExpr(toExpr(c)))

  /** Bounded-fixpoint repair (≤ MojibakeRepair.MaxPasses sweeps): what ftfy's
    * own loop does — handles double-encoded text and abutting fragments the
    * single sweep leaves behind, so crawl-curation callers need not know to
    * apply the repair twice. */
  def fixMojibakeFixpoint(c: Column): Column =
    fromExpr(FixMojibakeFixpointExpr(toExpr(c)))

  /** CCNet-style dedup-key normalization (lowercase, deaccent, digits and
    * punctuation to spaces, collapse, trim) — ONE codegen'd pass; feed the
    * result to exactRows/exact for normalization-insensitive dedup. */
  def dedupKey(c: Column): Column = fromExpr(DedupKeyExpr(toExpr(c)))

  /** Sliding-window token chunking with overlap — the RAG/context-prep
    * splitter: windows of `maxTokens` tokens advancing by
    * `maxTokens - overlap`, the last window short. Texts of <= maxTokens
    * tokens yield one chunk; empty/whitespace texts yield none. Pure
    * built-ins (sequence/transform/slice/array_join), fully codegen'd,
    * no UDF. Complements SplitElements (recursive element bisection):
    * this is the flat columnar form for (doc, chunk) training rows.
    *
    * Chunks preserve the original casing and punctuation of the text;
    * tokens are whitespace-split and re-joined with single spaces, so
    * runs of whitespace (newlines, tabs) collapse — a chunk is NOT a
    * verbatim substring of the document. Token boundaries are identical
    * to tokens()/tokenCount(), so counts line up across the library. */
  def chunkTokens(c: Column, maxTokens: Int, overlap: Int = 0): Column = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap maxTokens=$maxTokens")
    val step = maxTokens - overlap
    // same boundaries as tokens() but without lower(): a context splitter
    // must not destroy the casing the downstream model will read
    val toks = split(trim(c), "\\s+")
    val n = size(toks)
    // chunks = 1 + ceil((n - maxTokens) / step) for n > maxTokens, else 1
    val extra = ceil((n - lit(maxTokens)).cast("double") / step).cast("int")
    val nChunks = when(n <= maxTokens, lit(1)).otherwise(lit(1) + extra)
    // \S probe, not length(trim(...)): trim strips only SPACES, so a
    // newline/tab-only text would dodge a trim-based guard and emit one
    // junk chunk of bare separators instead of the documented zero
    when(!c.rlike("\\S"), array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * step + 1, lit(maxTokens)), " ")))
  }

  /** Count of tokens present in a blocklist — the C4-style wordlist filter
    * (Raffel et al. 2020 drop any page containing a "bad word"). Token-set
    * membership, not substring: "grass" must not hit a blocklist "ass"
    * (the scunthorpe failure mode of substring filters). Built-ins only,
    * so the check stays inside codegen at any list size that fits an
    * isin() — for truly huge lists broadcast-join the token explode. */
  def blocklistHits(c: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "blocklist must not be empty")
    size(filter(tokens(c), t => t.isin(words.map(_.toLowerCase): _*)))
  }

  // ------------------------------------------------------ PII scrubbing

  /**
   * PII redaction patterns for training-corpus cleaning. Chosen for
   * IDENTICAL semantics in Java regex and RE2 (no backrefs, no lookaround,
   * ASCII word boundaries), so the DuckDB oracle replays them exactly.
   * Applied in fixed order: email, ssn, phone, ipv4 — the later patterns
   * can never match inside an earlier replacement (no digits in "[PII]").
   */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn"   -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\+?\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b",
    "ipv4"  -> "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b")

  /** Redact emails / SSNs / phone numbers / IPv4s (codegen'd regex chain). */
  def scrubPii(c: Column, replacement: String = "[PII]"): Column =
    PiiPatterns.foldLeft(c) { case (acc, (_, p)) => regexp_replace(acc, p, replacement) }

  // ------------------------------------------------------- URL analysis

  /** Two-label public suffixes the registered-domain heuristic recognizes —
    * the high-traffic subset of the public-suffix list (the full list is a
    * data file; callers with one plug it in via the overload). */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "co.in", "co.nz", "com.br", "com.cn",
    "com.mx", "co.za", "com.sg", "com.tr", "com.ar")

  /** Host of a URL: authority minus userinfo and port, lowercased; ''
    * when no scheme://authority is present. Pure built-ins (regexp_extract
    * + split), so it replays 1:1 in a SQL oracle. */
  def urlHost(c: Column): Column = {
    val auth = regexp_extract(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    val noUser = element_at(split(auth, "@"), -1)
    lower(element_at(split(noUser, ":"), 1))
  }

  /** Tracking-parameter names dropped by [[canonicalizeUrl]]: the
    * analytics params that fork otherwise-identical URLs (the #1 cause of
    * spurious crawl "duplicates" that URL-keyed dedup then misses). */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid")

  /**
   * URL canonicalization — the KEY every URL-level dedup / frequency-cap /
   * blocklist join should group on (raw URLs fork on case, default ports,
   * tracking params, fragments and trailing slashes). Canonical form:
   * `scheme://host[:port]path[?sorted-params]` with scheme+host
   * lowercased, a leading `www.` stripped, default ports (http:80,
   * https:443) dropped, the fragment dropped, ONE trailing path slash
   * stripped (root becomes empty), params whose name starts `utm_` or is
   * in [[TrackingParams]] dropped, and the survivors byte-sorted (query
   * order is almost never semantic; sorting is what makes `?a=1&b=2`
   * and `?b=2&a=1` collide). Non-URLs (no scheme://) pass through
   * unchanged. Pure built-ins — regexp_extract / filter / array_sort —
   * so it replays 1:1 in the SQL oracle and stays row-local at any scale.
   */
  def canonicalizeUrl(c: Column): Column = {
    val scheme = lower(regexp_extract(c, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val auth = regexp_extract(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    val noUser = element_at(split(auth, "@"), -1)
    val host0 = lower(element_at(split(noUser, ":"), 1))
    val host = regexp_replace(host0, "^www\\.", "")
    val port = regexp_extract(noUser, ":(\\d+)$", 1)
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val portPart = when(port === "" || defaultPort, lit("")).otherwise(concat(lit(":"), port))
    val path0 = regexp_extract(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = regexp_replace(path0, "/$", "")
    // the query starts at the first '?' BEFORE any '#': a '?' inside the
    // fragment ('/p#sec?x=1') is fragment content and must drop with it,
    // not resurrect as the canonical query
    val query = regexp_extract(c, "^[^#?]*\\?([^#]*)", 1)
    val keep = filter(split(query, "&"), p => {
      val name = element_at(split(p, "="), 1)
      p =!= "" && !name.startsWith("utm_") && !name.isin(TrackingParams: _*)
    })
    val sortedQ = array_join(array_sort(keep), "&")
    val queryPart = when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ))
    when(scheme === "", c)
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  /** eTLD+1 ("registered domain") of a host: last two labels, or last three
    * when the last two are a multi-part public suffix — the unit every
    * crawl-curation domain blocklist/frequency cap keys on (C4's and
    * RefinedWeb's URL filters operate here). Branches evaluate lazily, so
    * short hosts never index out of range. */
  def registeredDomain(host: Column, suffixes: Seq[String] = MultiPartSuffixes): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    when(host.isNull || host === "", lit(""))
      .when(n >= 3 && last2.isin(suffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(host)
  }

  // ------------------------------------------- repetition (Gopher rules)

  /** Max multiplicity of any element of a string array — one hash pass,
    * row-local, codegen'd (TopCountExpr). */
  def topCount(c: Column): Column = fromExpr(TopCountExpr(toExpr(c)))

  /** Fraction of non-blank lines that repeat an earlier line — the
    * duplicate-line signal from the Gopher/MassiveText quality rules. */
  def dupLineFraction(c: Column): Column = {
    val lines = filter(split(c, "\n"), l => length(trim(l)) > 0)
    when(size(lines) === 0, lit(0.0)).otherwise(
      (size(lines) - size(array_distinct(lines))).cast("double") / size(lines))
  }

  /** The full Gopher A1.2 repetition-signal struct (exact integer
    * numerators/denominators; see RepetitionStatsExpr) — ONE codegen'd
    * row-local pass. */
  def repetitionStats(c: Column): Column = fromExpr(RepetitionStatsExpr(toExpr(c)))

  /** The published A1.2 keep decision over a [[repetitionStats]] struct:
    * every fraction at or under its threshold, evaluated as integer
    * cross-multiplication (num*100 <= den*pct; empty denominator passes) —
    * no float ratio can flip a verdict at a boundary. */
  def repetitionKeep(stats: Column): Column = {
    import RepetitionStatsExpr._
    def ok(num: Column, den: Column, pct: Int): Column =
      den === 0 || num * 100 <= den * pct
    val lineRules = Seq(
      ok(stats("dup_lines"), stats("n_lines"), LineFracPct),
      ok(stats("dup_paras"), stats("n_paras"), LineFracPct),
      ok(stats("dup_line_chars"), stats("line_chars"), LineCharFracPct),
      ok(stats("dup_para_chars"), stats("para_chars"), LineCharFracPct))
    val ngramRules =
      TopNs.map(n => ok(stats(s"top${n}_chars"), stats("word_chars"), TopThresholdPct(n))) ++
      DupNs.map(n => ok(stats(s"dup${n}_chars"), stats("word_chars"), DupThresholdPct(n)))
    (lineRules ++ ngramRules).reduce(_ && _)
  }

  /** Convenience: A1.2 keep straight from text. */
  def repetitionKeepText(c: Column): Column = repetitionKeep(repetitionStats(c))

  // ------------------------------------------------------- language id

  private[functions] val StopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for", "with", "was", "this"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con", "para"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "du", "que", "pour", "dans", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "dem", "ein", "eine", "nicht", "auf"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "他", "这", "不", "就"))

  /**
   * Heuristic language id: argmax of per-language stopword hits over the
   * token set; "und" (undetermined) when nothing matches. An n-gram model
   * would be the production path; the stopword heuristic is deterministic
   * and dependency-free. ONE codegen'd pass (LangIdExpr) — the previous
   * Column formulation re-tokenized under five lambda functions because
   * subexpression elimination skips LambdaFunction children (measured as
   * q_langid's 7x drift across rounds as the gate table grew).
   */
  def langId(c: Column): Column = fromExpr(LangIdExpr(toExpr(c)))

  // ------------------------------------------------------- readability

  /**
   * Flesch-Kincaid readability counts + grade (Kincaid et al. 1975) —
   * the classic curriculum/difficulty signal for training-data
   * stratification (e.g. "textbook-grade" subsets). Counts are the
   * standard heuristics: words = whitespace tokens, sentences =
   * `[.!?]+` runs (floored at 1 for non-empty text), syllables = vowel
   * groups `[aeiouy]+` with a minimum of one per word (vowel-less
   * tokens — acronyms, numbers — count one). Grade rides as EXACT
   * integer milli-units: FK = 0.39·W/S + 11.8·Y/W − 15.59, so
   * fk_milli = (390·W² + 11800·Y·S − 15590·W·S) / (W·S), clamped at 0
   * then integer-divided — identical truncation in Java and DuckDB
   * because both operands are non-negative. Pure built-ins; the three
   * regex scans are the whole cost (row-local, codegen'd).
   * Struct: (n_words, n_sentences, n_syllables, fk_milli).
   */
  def readabilityStats(c: Column): Column = fromExpr(ReadabilityExpr(toExpr(c)))

  // -------------------------------------------------- quantile sketch

  /** One-pass mergeable ε-approximate quantiles of an int64 column (see
    * QuantileSummaryAgg) — returns array<long> aligned with `permilles`.
    * Sketch path: use when quantiles feed monitoring/heuristics; use
    * Packing.rankBins / Calibration.winsorize when they must be exact. */
  def approxQuantiles(c: Column, permilles: Seq[Int], k: Int = 256): Column =
    fromExpr(QuantileSummaryAgg(toExpr(c), k, permilles).toAggregateExpression())

  // ------------------------------------- denoising-objective preparation

  /**
   * Fill-in-the-middle transform (Bavarian et al. 2022) — the code/text
   * infilling objective prep: split the document at two DETERMINISTIC
   * cut points (salted-hash of the row id, so the corpus re-renders
   * identically on every run) and emit PSM order
   * `<PRE>prefix<SUF>suffix<MID>middle`. Cut points land in the first
   * and middle thirds, so all three pieces are non-empty; texts under 10
   * chars pass through untouched. Pure substr/concat — row-local,
   * codegen'd, and replayable 1:1 in a SQL oracle.
   */
  def fimTransform(id: Column, text: Column): Column = {
    val n = length(text).cast("long")
    val third = greatest(((n - pmod(n, lit(3L))) / lit(3L)).cast("long"), lit(1L))
    val p1 = lit(1L) + pmod(polyFingerprint(concat(id.cast("string"), lit(":fim:a"))), third)
    val p2 = p1 + lit(1L) + pmod(polyFingerprint(concat(id.cast("string"), lit(":fim:b"))), third)
    when(n < 10, text).otherwise(concat(
      lit("<PRE>"), substr(text, lit(1L), p1),
      lit("<SUF>"), substr(text, p2 + 1, n),
      lit("<MID>"), substr(text, p1 + 1, p2 - p1)))
  }

  /**
   * T5-style span corruption (Raffel et al. 2020 §3.1.4) over whitespace
   * tokens, BLOCK-ALIGNED so the masking needs no sequential state: the
   * token stream is cut into blocks of 10; a salted-hash coin per block
   * masks its last 3 tokens (~7.5% corruption rate at 1-in-4 blocks,
   * mean span 3 — the paper's defaults). Input keeps the block's first 7
   * tokens plus a sentinel; target is the sentinel plus the 3 masked
   * tokens. Sentinels carry the BLOCK index (deterministic, though not
   * consecutive like the paper's <extra_id_k> — renumbering would need a
   * running count, i.e. sequential state). Partial tail blocks never
   * mask. Struct: (input, target, n_masked). Row-local HOFs over
   * bounded block lists; no UDF, no shuffle.
   */
  def spanCorrupt(id: Column, text: Column): Column =
    fromExpr(SpanCorruptExpr(toExpr(id.cast("string")), toExpr(text)))

  // ---------------------------------------------------- Luhn / credit cards

  /**
   * Luhn checksum validity (ISO/IEC 7812) of the digits in `c` — the
   * missing credit-card leg of the PII family (scrubPii's regexes catch
   * shapes; Luhn separates real card numbers from arbitrary digit runs,
   * cutting false redactions ~10x). Index-free formulation so the SQL
   * oracle replays it without lambda-index support: chunk the REVERSED
   * digit string into pairs (`..|.`); a pair's first char sits at an odd
   * 1-based position from the right (summed as-is), its second at an even
   * position (doubled, minus 9 above 4). Valid = length 13-19 and
   * sum % 10 == 0. Higher-order functions over a bounded 10-element
   * array — row-local, no UDF.
   */
  def luhnValid(c: Column): Column = {
    val ds = regexp_replace(c, "[^0-9]", "")
    val pairs = regexp_extract_all(reverse(ds), lit("..|."), lit(0))
    val digit = (p: Column, i: Int) => (ascii(substring(p, i, 1)) - 48).cast("long")
    val sum = aggregate(pairs, lit(0L), (acc, p) => {
      val d1 = digit(p, 1)
      val d2 = digit(p, 2)
      val doubled = when(d2 > 4, d2 * 2 - 9).otherwise(d2 * 2)
      acc + d1 + when(length(p) === 2, doubled).otherwise(lit(0L))
    })
    length(ds).between(13, 19) && sum % 10 === 0
  }

  /**
   * IBAN checksum validity (ISO 13616 mod-97): the bank-account leg of the
   * PII family, the Luhn pattern applied to account identifiers. The
   * check: strip separators, uppercase, move the first 4 chars to the end,
   * map letters A..Z to 10..35, and the resulting digit string mod 97 must
   * be 1. The mod is computed as a LEFT FOLD over characters —
   * acc = (acc·10 + digit) % 97, letters as two digit steps — pure int64
   * in fixed order, so a SQL oracle replays it bit-for-bit (no bignum
   * needed on either engine). Valid = 15-34 chars, two leading letters,
   * two check digits, alphanumeric body, checksum 1.
   */
  def ibanValid(c: Column): Column = {
    val s = upper(regexp_replace(c, "[ -]", ""))
    val shaped = s.rlike("^[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}$")
    val rearranged = concat(substring(s, 5, 34), substring(s, 1, 4))
    val m = aggregate(
      split(rearranged, ""),
      lit(0L),
      (acc, ch) => {
        val a = ascii(ch)
        when(a.between(48, 57), (acc * 10L + (a - 48).cast("long")) % 97L)
          .otherwise((acc * 100L + (a - 55).cast("long")) % 97L)
      })
    shaped && m === 1L
  }

  /** Candidate IBAN pattern: country code + check digits + 11-30
    * alphanumerics, single space/dash separators allowed. ASCII-only, no
    * lookaround — Java and RE2 agree. */
  val IbanCandidatePattern = "\\b[A-Z]{2}\\d{2}(?:[ -]?[A-Z0-9]){11,30}\\b"

  /** Redact checksum-VALID IBANs only (the scrubCreditCards discipline:
    * shape alone over-redacts; the mod-97 gate separates real account
    * numbers from arbitrary alphanumeric runs).
    *
    * The greedy candidate pattern can absorb a following space/dash-
    * separated uppercase/digit token ("pay DE89...3000 NOW" matches as one
    * candidate); the merged string fails mod-97 and the genuine IBAN would
    * escape unredacted. So each candidate is validated longest-first
    * against its separator-boundary prefixes (the full match, then trimmed
    * back to each space/dash), and the longest checksum-valid prefix is
    * what gets redacted. Cost is bounded by separators-per-candidate
    * (≤ 30), never corpus size. */
  def scrubIbans(c: Column, replacement: String = "[IBAN]"): Column = {
    val cands = regexp_extract_all(c, lit(IbanCandidatePattern), lit(0))
    val best = transform(cands, p => {
      // prefix end positions: full length first, then each position just
      // before a separator, descending (longest valid prefix wins)
      val sepPos = filter(sequence(lit(1), length(p)),
        i => p.substr(i, lit(1)).isin(" ", "-"))
      val ends = concat(array(length(p)), reverse(transform(sepPos, i => i - 1)))
      get(filter(transform(ends, e => p.substr(lit(1), e)), q => ibanValid(q)),
        lit(0))
    })
    val valid = filter(best, p => p.isNotNull)
    aggregate(valid, c, (acc, p) => replace(acc, p, lit(replacement)))
  }

  /** Candidate card-number pattern: 13-19 digits, single space/dash
    * separators allowed (the common formatting). ASCII-only, no
    * lookaround — Java and RE2 agree. */
  val CardCandidatePattern = "\\b\\d(?:[ -]?\\d){12,18}\\b"

  /** Redact Luhn-VALID card numbers only; invalid digit runs (order ids,
    * timestamps) survive. Fold over the row's own candidates — bounded by
    * per-row candidate count, never corpus size. */
  def scrubCreditCards(c: Column, replacement: String = "[CC]"): Column = {
    val cands = regexp_extract_all(c, lit(CardCandidatePattern), lit(0))
    val valid = filter(cands, p => luhnValid(p))
    aggregate(valid, c, (acc, p) => replace(acc, p, lit(replacement)))
  }
}
