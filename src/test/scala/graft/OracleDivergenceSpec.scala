package graft

import org.apache.spark.sql.functions._

/**
 * Guard for the documented RE2 (DuckDB oracle) vs java.util.regex
 * (engine) divergence — see the gopherSigCtes scaladoc in SparkEntry.
 * The two engines disagree on exactly five characters: vertical tab
 * U+000B (in Java's `\s` but not RE2's) and the line terminators
 * `\r`, U+0085, U+2028, U+2029 (Java `$` matches before a bare final
 * one, RE2 `$` does not). The regex-replaying gates are sound only
 * while the corpus text the regexes run over contains none of them;
 * this spec turns that precondition into a red test instead of a
 * latent hash mismatch on a future corpus.
 *
 * `\n` is exempt: both engines treat it identically under the modes
 * the oracles use, and the corpora legitimately contain it.
 */
class OracleDivergenceSpec extends SparkSpec {

  // U+000B, U+000D, U+0085, U+2028, U+2029 anywhere in the text
  private val divergent = "[\\x0B\\r\\x85\\u2028\\u2029]"

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    val dir = s"/root/testdata/$sf"
    test(s"$sf documents.text is free of oracle-divergent characters") {
      assume(new java.io.File(dir).isDirectory)
      val n = spark.read.parquet(s"$dir/documents.parquet")
        .where(col("text").rlike(divergent))
        .count()
      assert(n == 0L,
        s"$n documents contain U+000B/U+000D/U+0085/U+2028/U+2029 — " +
          "the DuckDB-replay oracles diverge from java.util.regex on " +
          "these; make the affected oracles explicit before trusting " +
          "the gates on this corpus (see gopherSigCtes scaladoc)")
    }
  }
}
