package graft.scoring

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Triple

/** Precision/recall of emitted (subj, pred, obj, lang) triples against a
  * golden set — the formalization of the reference's golden
  * output-cardinality reconciliation (src/logs/2/CLUSTERS-TEST, SURVEY.md
  * §5.3) into the north rule's P/R >= 0.95 gate. Distributed: set
  * differences are anti-joins, no driver-side collection of the corpus. */
object PrScorer {

  final case class PR(tp: Long, fp: Long, fn: Long) {
    def precision: Double = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
  }

  private val key = Seq("subj", "pred", "obj", "lang")

  def score(got: DataFrame, golden: DataFrame): PR = {
    val g = got.select(key.map(col): _*).distinct()
    val o = golden.select(key.map(col): _*).distinct()
    val tp = g.join(o, key, "left_semi").count()
    val fp = g.join(o, key, "left_anti").count()
    val fn = o.join(g, key, "left_anti").count()
    PR(tp, fp, fn)
  }

  def goldenDf(spark: SparkSession, golden: Set[Triple]): DataFrame = {
    import spark.implicits._
    golden.toSeq.map(t => (t.subj, t.pred, t.obj, t.objLang))
      .toDF("subj", "pred", "obj", "lang")
  }
}
