package graft.score

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** M4 — overall score, the EXACT reference formula
  * (reference: analysis/classifier.py:327-352):
  *
  *   if not stage_1_pass: 0.0
  *   score  = sophistication * 0.3
  *   score += max(0, 10 - avg(stage_2)) / 10 * 0.4     (inversion :337-338)
  *   score += recMap(stage_3) * 0.3                    (map :341-347)
  *   return min(1.0, score)                            (clamp :352)
  *
  * P1 keep threshold: overall_score >= 0.4 (paper_analyser.py:128).
  * This formula + threshold define the keep/drop label — the F1 target.
  */
object Score {

  val KeepThreshold = 0.4

  /** recommendation → weight (classifier.py:341-347); unknown → 0.0. */
  val RecommendationScores: Map[String, Double] = Map(
    "REJECT" -> 0.0,
    "BORING_MISTAKE" -> 0.2,
    "EDUCATIONAL_FAILURE" -> 0.6,
    "CREATIVE_APPROACH" -> 0.8,
    "SOPHISTICATED_ERROR" -> 1.0)

  def recScore(rec: Column): Column =
    RecommendationScores.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(rec === k, lit(v)).otherwise(acc)
    }

  def recScoreStr(rec: String): Double = RecommendationScores.getOrElse(rec, 0.0)

  def overall(stage1Pass: Column, soph: Column, avg2: Column, rec: Column): Column =
    when(!stage1Pass, lit(0.0)).otherwise(
      least(lit(1.0),
        soph * 0.3 +
          greatest(lit(0.0), lit(10.0) - avg2) / 10.0 * 0.4 +
          recScore(rec) * 0.3))

  def overallStr(stage1Pass: Boolean, soph: Double, avg2: Double, rec: String): Double =
    if (!stage1Pass) 0.0
    else math.min(1.0,
      soph * 0.3 +
        math.max(0.0, 10.0 - avg2) / 10.0 * 0.4 +
        recScoreStr(rec) * 0.3)

  def keep(overallScore: Column): Column = overallScore >= KeepThreshold
}
