package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Blocked fuzzy (edit-distance) join: pairs of rows whose string keys
 * are within `maxDist` Levenshtein edits, restricted to a blocking
 * predicate so the join never goes all-pairs.
 *
 * Scale shape: the blocking key (prefix + coarse length band) turns
 * the quadratic similarity join into an EQUI-join Catalyst executes as
 * a hash join (broadcast when one side is small), with the Levenshtein
 * check as a post-join filter on candidate pairs only. This is the
 * standard blocking/windowing decomposition from the entity-resolution
 * literature; recall is bounded by the blocking choice — an edit
 * inside the first `prefixLen` characters or one that crosses a length
 * band escapes the block (callers needing full recall run multiple
 * passes with complementary blocking keys, e.g. prefix of the
 * reversed string). Documented trade, not a bug: full-recall
 * similarity joins at 100 TB are exactly what blocking exists for.
 *
 * Spark 4's built-in `levenshtein(l, r, threshold)` short-circuits the
 * DP once the running distance exceeds the threshold — O(maxDist *
 * min(len)) per candidate instead of O(len^2).
 */
object FuzzyJoin {

  /**
   * Join `left` and `right` on `leftText` ~ `rightText` within
   * `maxDist` edits, blocked on (first `prefixLen` chars, length /
   * bandWidth). Output: left id, right id, both strings, the distance.
   */
  def levenshteinJoin(left: DataFrame, leftId: String, leftText: String,
                      right: DataFrame, rightId: String, rightText: String,
                      maxDist: Int, prefixLen: Int = 2,
                      bandWidth: Int = 8): DataFrame = {
    require(maxDist >= 0 && prefixLen >= 1 && bandWidth > maxDist,
      "bandWidth must exceed maxDist so near pairs stay within one band " +
        "of each other; maxDist >= 0; prefixLen >= 1")
    val l = left.select(col(leftId).as("id_l"), col(leftText).as("text_l"),
      substring(col(leftText), 1, prefixLen).as("__blk_p"),
      floor(length(col(leftText)) / bandWidth).as("__blk_n"))
    val r = right.select(col(rightId).as("id_r"), col(rightText).as("text_r"),
      substring(col(rightText), 1, prefixLen).as("__blk_p"),
      floor(length(col(rightText)) / bandWidth).as("__blk_n"))
    // near-length pairs can straddle a band boundary: probe the right
    // side into its own band and both neighbors (3 candidate buckets,
    // still an equi-join — the explode is on the SMALL probe set)
    val rExp = r.withColumn("__blk_n",
      explode(array(col("__blk_n") - 1, col("__blk_n"), col("__blk_n") + 1)))
    val dist = levenshtein(col("text_l"), col("text_r"), maxDist)
    l.join(rExp, Seq("__blk_p", "__blk_n"))
      .withColumn("dist", dist)
      // threshold form returns -1 when the distance exceeds maxDist
      .where(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id_l"), col("id_r"), col("text_l"), col("text_r"),
        col("dist"))
  }
}
