package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes document classifier — the in-engine
  * "trained quality/language classifier" of a curation pipeline
  * (the fastText-linear-classifier role: CCNet and GPT-3's data work
  * both gate documents on a cheap supervised classifier; language ID
  * and source attribution are the same computation with a different
  * label column).
  *
  * Reference analogue: none — pipeline extension beside Dsir (learned
  * importance weights) and TextAnalysis.langId (fixed n-gram
  * heuristic); this is the LEARNED classifier: any labeled corpus
  * defines the classes.
  *
  * Model: add-one-smoothed multinomial NB. For class c with token
  * total n_c over vocabulary of V distinct tokens,
  * `L(w,c) = ln((count(w,c)+1)/(n_c+V))`, zero-count floor
  * `L0(c) = ln(1/(n_c+V))`, prior `ln(docs_c/docs)`. A document's
  * class score is `prior + n_d*L0 + sum_w tf(w)*(L(w,c)-L0(c))` —
  * algebraically identical to the textbook sum but expressed so only
  * words PRESENT in the model need joining (absent words contribute
  * exactly their floor term through n_d*L0).
  *
  * Determinism/oracle: every per-token likelihood is rounded to 6
  * decimals and cast to DECIMAL(18,6) BEFORE any summation, so all
  * sums are exact decimal arithmetic — addition-order-free, hence
  * bit-identical across engines (unlike a double sum, whose partial-
  * aggregation order differs between Spark and a single-node engine).
  * The final score surfaces as DOUBLE: a scale-6 decimal of this
  * magnitude converts exactly. Prediction ties break on the smaller
  * class label — a total order.
  *
  * 100 TB shape: the corpus-scale work is one (doc,word) map-side-
  * combinable aggregation for term frequencies; the model is
  * vocab x classes and BROADCAST to the scoring join; per-doc token
  * counts ride the scan (`size(tokens)`), the class cross join
  * multiplies rows by |C| (small), and the argmax is a per-doc window
  * over |C| rows. `minCount` caps the broadcast for open-vocabulary
  * corpora (the Perplexity.score(minCount) discipline): words rarer
  * than the cap fall to the zero-count floor, which the algebra
  * already charges through n_d*L0.
  */
object NaiveBayes {

  private val Dec = "decimal(18,6)"

  /** Train on `train` (labelCol + textCol) and classify every row of
    * `docs`: (idCol, [labelCol if present in docs], pred, score) with
    * score = the winning class's NB log-probability (6-dec exact).
    * Pass `minCount` > 1 to drop rare words from the broadcast model
    * at open-vocabulary scale. */
  def classify(train: DataFrame, docs: DataFrame,
      labelCol: String = "lang", textCol: String = "text",
      idCol: String = "doc_id", minCount: Long = 1L): DataFrame = {
    val tok = train.select(col(labelCol).as("_c"),
      explode(TextAnalysis.tokens(col(textCol))).as("_w"))
    val totals = train.agg(count(lit(1)).as("_n"))
    val vocab = tok.agg(countDistinct(col("_w")).as("_v"))
    // per-class priors and zero-count floors: |C| rows
    val cls = train.groupBy(col(labelCol).as("_c"))
      .agg(count(lit(1)).as("_ndocs"))
      .join(tok.groupBy("_c").agg(count(lit(1)).as("_ntok")), "_c")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(vocab))
      .select(col("_c"),
        round(log(col("_ndocs").cast("double") / col("_n")), 6)
          .cast(Dec).as("_prior"),
        round(log(lit(1.0) / (col("_ntok") + col("_v"))), 6)
          .cast(Dec).as("_l0"))
    // word-class likelihood DELTAS vs the floor: only seen (w,c) pairs
    val model = tok.groupBy("_c", "_w").agg(count(lit(1)).as("_cnt"))
      .where(col("_cnt") >= minCount)
      .join(tok.groupBy("_c").agg(count(lit(1)).as("_ntok")), "_c")
      .crossJoin(broadcast(vocab))
      .select(col("_c"), col("_w"),
        (round(log((col("_cnt") + lit(1)).cast("double") /
            (col("_ntok") + col("_v"))), 6).cast(Dec) -
          round(log(lit(1.0) / (col("_ntok") + col("_v"))), 6).cast(Dec))
          .as("_delta"))
    val hasLabel = docs.columns.contains(labelCol)
    val keep = if (hasLabel) Seq(col(labelCol)) else Nil
    // per-doc token totals ride the scan; the token explode feeds one
    // map-side-combinable tf aggregation
    val docsNd = docs.select(col(idCol).as("_id") +: keep :+
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("_nd"): _*)
    val tf = docs
      .select(col(idCol).as("_id"), explode(TextAnalysis.tokens(col(textCol))).as("_w"))
      .groupBy("_id", "_w").agg(count(lit(1)).as("_tf"))
    // one union + one aggregation instead of (base LEFT JOIN adj):
    // both sides of that join are corpus-sized, so it would sort-merge;
    // as score CONTRIBUTIONS they sum in a single map-side-combinable
    // shuffle (decimal sums are exact, so splitting the formula across
    // rows changes nothing). The per-class base row carries the
    // passthrough label; max() lifts it past the model rows' nulls.
    val wide = "decimal(38,6)"
    val contribs = tf.join(broadcast(model), "_w")
      .select(col("_id"), col("_c"),
        (col("_tf") * col("_delta")).cast(wide).as("_contrib"),
        lit(null).cast("string").as("_label"))
      .unionByName(docsNd.crossJoin(broadcast(cls))
        .select(col("_id"), col("_c"),
          (col("_prior") + col("_nd") * col("_l0")).cast(wide).as("_contrib"),
          (if (hasLabel) col(labelCol).cast("string")
           else lit(null).cast("string")).as("_label")))
    val scores = contribs.groupBy("_id", "_c")
      .agg(sum(col("_contrib")).as("_score"), max(col("_label")).as("_lbl"))
    val w = Window.partitionBy("_id")
      .orderBy(col("_score").desc, col("_c").asc)
    val keepOut = if (hasLabel) Seq(col("_lbl").as(labelCol)) else Nil
    scores.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col("_id").as(idCol) +: keepOut :+
        col("_c").as("pred") :+
        col("_score").cast("double").as("score"): _*)
  }

  /** The trained model's class-level summary: (labelCol, n_docs,
    * n_tokens, prior_e6, l0_e6) — |C| rows, the auditable half of the
    * model (the word table is vocabulary-sized; inspect it via
    * classify's scores instead). The two log quantities surface as
    * floor-scaled e6 BIGINTs (`floor(x*1e6 + 0.5)` — deterministic
    * IEEE ops), never as engine-ROUNDed doubles: `ROUND(double, n)`
    * differs in the last ulp across engines/versions, which breaks
    * hash-checked output even when the underlying value matches. */
  def classSummary(train: DataFrame,
      labelCol: String = "lang", textCol: String = "text"): DataFrame = {
    val tok = train.select(col(labelCol).as("_c"),
      explode(TextAnalysis.tokens(col(textCol))).as("_w"))
    val totals = train.agg(count(lit(1)).as("_n"))
    val vocab = tok.agg(countDistinct(col("_w")).as("_v"))
    train.groupBy(col(labelCol).as("_c"))
      .agg(count(lit(1)).as("n_docs"))
      .join(tok.groupBy("_c").agg(count(lit(1)).as("n_tokens")), "_c")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(vocab))
      .select(col("_c").as(labelCol), col("n_docs"), col("n_tokens"),
        floor(log(col("n_docs").cast("double") / col("_n"))
          * lit(1e6) + lit(0.5)).as("prior_e6"),
        floor(log(lit(1.0) / (col("n_tokens") + col("_v")))
          * lit(1e6) + lit(0.5)).as("l0_e6"))
  }
}
