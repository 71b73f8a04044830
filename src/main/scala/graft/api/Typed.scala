package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The test-corpus document record (`documents.parquet`). */
final case class Document(doc_id: Long, text: String, lang: String,
                          source: String, n_chars: Long)

/** The test-corpus embedding record (`embeddings.parquet`). */
final case class Embedding(vec_id: Long, embedding: Seq[Float],
                           label: Int)

/** The test-corpus event record (`events.parquet`). */
final case class Event(event_id: Long, ts: java.sql.Timestamp,
                       user_id: Long, event_type: String, value: Double,
                       props: String)

/**
 * Typed `Dataset[T]` entry points over the corpus tables — the
 * case-class-`Encoder` surface for pipelines that want compile-time
 * schemas (a renamed upstream column fails at `.as[T]` analysis, not
 * three stages later as a null cascade). Extension beyond the
 * reference surface (its API is untyped dict-driven Python,
 * `parquery/aggregate.py:21-38`).
 *
 * Discipline for 100 TB: typed records, UNTYPED operators. Every
 * combinator here keeps the plan in `Column` expressions and only
 * carries `T` through `.as[T]` — a `.filter(t => ...)` lambda would
 * deserialize every row, kill predicate pushdown AND whole-stage
 * codegen, and is deliberately absent. `Dataset[T]` is the schema
 * contract at the pipeline boundary; Catalyst still sees declarative
 * expressions everywhere inside (the `graft.operators` engines stay
 * the single implementation — these wrappers re-type their output,
 * they do not fork logic).
 */
object Typed {

  def documents(spark: SparkSession, sfDir: String): Dataset[Document] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet").as[Document]
  }

  def embeddings(spark: SparkSession, sfDir: String): Dataset[Embedding] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/embeddings.parquet").as[Embedding]
  }

  def events(spark: SparkSession, sfDir: String): Dataset[Event] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/events.parquet").as[Event]
  }

  /** Length-band quality gate; a `Column` predicate, so it reaches the
    * parquet scan as a pushed filter (a typed lambda would not). */
  def lengthGate(docs: Dataset[Document], minChars: Long,
                 maxChars: Long): Dataset[Document] =
    docs.filter(col("n_chars") >= minChars && col("n_chars") <= maxChars)

  /** Exact text dedup, typed in/out: the untyped engine runs the plan
    * ([[graft.operators.Dedup.exact]] — one hash shuffle, min-id
    * survivor), the result re-types losslessly because `exact`
    * preserves the input columns. */
  def dedupExact(docs: Dataset[Document]): Dataset[Document] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.Dedup.exact(docs.toDF(), Seq("text"), "doc_id")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[Document]
  }

  /** Deterministic split assignment as a typed pair — the split label
    * rides beside the intact record instead of a loose column. */
  def splitAssign(docs: Dataset[Document],
                  fractions: Seq[(String, Double)],
                  salt: String = ""): Dataset[(Document, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.Sampling.splitAssign(docs.toDF(), "doc_id",
        fractions, salt)
      .select(struct(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")).as("_1"), col("split").as("_2"))
      .as[(Document, String)]
  }
}
