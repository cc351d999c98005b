package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fasttext-style document-quality classifier — the model-based filter of
 * GPT-3/LLaMA-class pipelines (reference corpus filtering literature;
 * Brown et al. 2020 §A trained LR on hashed features against a WebText
 * positive class): hashed lowercased unigram bag -> logistic regression,
 * trained on a labeled seed set (e.g. curated wiki-like positives vs
 * crawl negatives, or the rule-based gopherKeep/c4Keep verdicts as weak
 * labels for distillation into a smoother score).
 *
 * Spark-first shape: HashingTF is a narrow map (no vocabulary build, no
 * shuffle, fixed 2^18-dim sparse vectors), LR training is MLlib's
 * distributed L-BFGS over the labeled set, and scoring is a broadcast
 * model applied row-wise — at 100 TB the expensive part (scoring) is a
 * pure map stage; training data is the small curated seed set by
 * construction. Deterministic: hashing is seedless-stable, LR uses a
 * fixed initial state and convergence tolerance.
 *
 * The tokens column must be the engine's standard tokenizer
 * ([[graft.functions.gf.tokens]]) so scores line up with every other
 * token-based signal.
 */
object QualityClassifier {

  final case class Model(lr: LogisticRegressionModel, numFeatures: Int)

  private def featurize(df: DataFrame, text: String, numFeatures: Int): DataFrame = {
    // THE engine tokenizer, not a re-derivation — scores must line up
    // with every other token-based signal even if tokens() ever changes
    val toks = df.withColumn("__toks",
      filter(graft.functions.gf.tokens(col(text)), t => t =!= ""))
    new HashingTF()
      .setInputCol("__toks").setOutputCol("__feat").setNumFeatures(numFeatures)
      .transform(toks)
      .drop("__toks")
  }

  /** Train on a labeled seed set: `label` is 1.0 for high-quality docs,
    * 0.0 for rejects. */
  def train(labeled: DataFrame, text: String, label: String,
            numFeatures: Int = 1 << 18, maxIter: Int = 50,
            regParam: Double = 1e-4): Model = {
    val feats = featurize(labeled, text, numFeatures)
      .withColumn("__lbl", col(label).cast("double"))
    val lr = new LogisticRegression()
      .setFeaturesCol("__feat").setLabelCol("__lbl")
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(false)
    Model(lr.fit(feats), numFeatures)
  }

  /** Score documents: adds `quality_prob` in [0,1] (P(high quality)).
    * The model rides to executors as a broadcast; scoring is map-only.
    * Operates on a COPY of the fitted model — mutating the shared
    * instance's params would leak '__prob' into other callers and race
    * under concurrent scoring. */
  def score(model: Model, df: DataFrame, text: String,
            out: String = "quality_prob"): DataFrame = {
    val feats = featurize(df, text, model.numFeatures)
    val probOf = udf((v: org.apache.spark.ml.linalg.Vector) => v(1))
    val lr = model.lr.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setFeaturesCol("__feat").setProbabilityCol("__prob")
    lr.transform(feats)
      .withColumn(out, probOf(col("__prob")))
      .drop("__feat", "__prob", "rawPrediction", "prediction")
  }

  /** Trained state quantized to int64 MICROS — the cross-engine-verifiable
    * form of the scoring path: margin z = intercept_µ + Σ_t count(t)·w_µ[h(t)]
    * is then pure integer arithmetic, so Spark and a SQL oracle replaying the
    * same per-token weights agree bit-exactly (the q_bpe_encode pattern:
    * trained state rides into the oracle as literals; float dot-product
    * rounding can never flip a comparison). */
  def quantize(model: Model): (Array[Long], Long) = {
    val lr = model.lr
    (lr.coefficients.toArray.map(w => math.round(w * 1e6)),
      math.round(lr.intercept * 1e6))
  }

  /** Codegen integer scoring: adds `out` = the quantized LR margin in
    * micros. This is the 100 TB scoring shape — weights ride once per task
    * binary as a plan reference object, the stage is a pure codegen row map,
    * and no vocabulary or driver state is involved (hashing replaces
    * lookup). `keep` ≙ margin ≥ 0 ≙ P(quality) ≥ 0.5. */
  def marginMicros(df: DataFrame, text: String, coefMicros: Array[Long],
                   interceptMicros: Long, out: String = "margin_micros"): DataFrame = {
    // one codegen expression, not a udf: the weight table rides as a plan
    // reference object and the hash replicates HashingTF.indexOf exactly
    // (see HashedWeightSumExpr), so training and scoring share buckets
    // while the stage stays inside whole-stage codegen
    import org.apache.spark.sql.graft.ColumnBridge
    df.withColumn(out, ColumnBridge.column(graft.functions.HashedWeightSumExpr(
      ColumnBridge.expression(graft.functions.gf.tokens(col(text))),
      coefMicros.toSeq, interceptMicros)))
  }

  /** (token, weight_µ) for every distinct corpus token with a nonzero hashed
    * weight — the literal table a SQL oracle joins against to replay
    * marginMicros. ORACLE-GENERATION ONLY: collects the distinct vocabulary
    * to the driver, which is bounded at gate scale but must never run at
    * corpus scale (the scoring path above needs no vocabulary at all). */
  def tokenWeights(corpus: DataFrame, text: String,
                   coefMicros: Array[Long], maxVocab: Int = 200000): Seq[(String, Long)] = {
    val htf = new HashingTF().setNumFeatures(coefMicros.length)
    val toks = corpus
      .select(explode(filter(graft.functions.gf.tokens(col(text)), t => t =!= "")).as("t"))
      .distinct().limit(maxVocab + 1).collect().map(_.getString(0))
    require(toks.length <= maxVocab,
      s"tokenWeights is oracle-generation-only; vocabulary exceeds $maxVocab")
    toks.toSeq.map(t => t -> coefMicros(htf.indexOf(t)))
      .filter(_._2 != 0L).sortBy(_._1)
  }

  /** Distillation convenience: weak-label with a rule column (e.g.
    * gf.gopherKeep && gf.c4Keep), train, and score the SAME corpus —
    * turning hard rule verdicts into a smooth ranking signal. */
  def distill(df: DataFrame, text: String, rule: Column,
              numFeatures: Int = 1 << 18): DataFrame = {
    val labeled = df.withColumn("__rule", rule.cast("double"))
    val m = train(labeled, text, "__rule", numFeatures)
    score(m, df, text)
  }
}
