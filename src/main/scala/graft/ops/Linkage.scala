package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage: edit-distance joins without the O(|L|·|R|)
  * cross product. The reference engine has no joins at all; this is
  * part of the beyond-reference pipeline surface (entity resolution /
  * near-identical name dedup in training-data curation).
  *
  * Candidate generation is SymSpell deletion-neighborhood blocking
  * (graft.functions.DeletionNeighborhood): two strings within
  * Levenshtein distance d always share a member of their depth-d
  * deletion neighborhoods, so exploding the neighborhood and
  * equi-joining on the variant is LOSSLESS — no missed pair, ever.
  * Candidates (a tiny superset of the answer) are then verified with
  * the exact `levenshtein` built-in. Every stage is a map or an
  * equi-join keyed by variant strings, so the plan scales like any
  * hash join: no theta join, no broadcast-nested-loop, no driver data.
  * Neighborhood fan-out is len+1 per row at d=1 (C(len,2)-ish at d=2)
  * — sized for name/title-length strings, not documents.
  *
  * Distance semantics are Java-char (UTF-16) based, matching Spark's
  * `levenshtein`: identical to codepoint distance for BMP text; for
  * supplementary-plane text the neighborhood still blocks consistently
  * (both sides delete the same units) but edit distance counts
  * surrogate halves. Cross-engine oracles should stick to BMP strings.
  */
object Linkage {

  private def variants(df: DataFrame, idCol: String, strCol: String,
                       outId: String, outStr: String, d: Int): DataFrame =
    df.filter(col(strCol).isNotNull)
      .select(col(idCol).as(outId), col(strCol).as(outStr),
        explode(graft.functions.VectorExprs.deletionNeighborhood(
          col(strCol), d)).as("__variant"))

  /** All pairs (left, right) with `levenshtein(leftStr, rightStr) <=
    * maxDist`, as (idL, idR, strL, strR, dist). Ids must be unique per
    * side. */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                leftId: String, leftStr: String,
                rightId: String, rightStr: String,
                maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2, "maxDist must be 1 or 2")
    val lv = variants(left, leftId, leftStr, "id_l", "str_l", maxDist)
    val rv = variants(right, rightId, rightStr, "id_r", "str_r", maxDist)
    // distinct BEFORE the verify: a pair can meet through several shared
    // variants; the exact levenshtein then runs once per candidate pair
    lv.join(rv, Seq("__variant"))
      .select("id_l", "id_r", "str_l", "str_r").distinct()
      .withColumn("dist", levenshtein(col("str_l"), col("str_r")))
      .filter(col("dist") <= maxDist)
  }

  /** Within-one-relation fuzzy pairs (id_a < id_b), the self-join form
    * used for near-identical name/title dedup. */
  def fuzzySelfPairs(df: DataFrame, idCol: String, strCol: String,
                     maxDist: Int): DataFrame =
    fuzzyJoin(df, df, idCol, strCol, idCol, strCol, maxDist)
      .filter(col("id_l") < col("id_r"))
      .select(col("id_l").as("id_a"), col("id_r").as("id_b"),
        col("str_l").as("str_a"), col("str_r").as("str_b"), col("dist"))
}
