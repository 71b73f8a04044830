package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Embedding-column transforms for training-data pipelines: L2
 * normalization (prerequisite for cosine = dot-product ANN) and int8
 * quantization (4x storage/bandwidth cut for 100 TB-scale vector
 * stores; the standard trick behind faiss' `SQ8` and most vector-DB
 * compressed tiers — symmetric per-vector scaling, public technique).
 *
 * Everything is a narrow, shuffle-free projection over the vector
 * column. All arithmetic is forced to DOUBLE before folding: the
 * parquet column is `array<float>`, and float-vs-double fold order
 * differences are exactly the kind of cross-engine drift the oracle
 * comparison would flag. Left-fold (`aggregate`) order is
 * deterministic and identical in Spark and DuckDB's `list_aggregate`,
 * so rounded outputs compare exactly.
 *
 * Extension beyond the reference surface (its transport moves
 * `pa.Table`s but it has no vector ops at all).
 */
object Embeddings {

  /** Sum over a DOUBLE-cast fold of the vector — deterministic order. */
  private def foldSum(vec: Column, f: Column => Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => acc + f(x.cast("double")))

  /** L2 norm of the vector, in double. */
  def l2Norm(vec: Column): Column = sqrt(foldSum(vec, x => x * x))

  /**
   * L2-normalize `vecCol` into `outCol` (doubles). Zero vectors pass
   * through unchanged (norm 0 would divide by zero). The norm is
   * materialized as its own column first so the `transform` lambda
   * captures a plain attribute — HOF lambdas are interpreted and
   * re-evaluate captured EXPRESSIONS per element (the round-1 64x
   * minhash lesson), but an attribute read is free.
   */
  def l2Normalize(df: DataFrame, vecCol: String,
                  outCol: String = "unit_vec"): DataFrame =
    df.withColumn("__norm", l2Norm(col(vecCol)))
      .withColumn(outCol,
        when(col("__norm") === 0.0, transform(col(vecCol), _.cast("double")))
          .otherwise(transform(col(vecCol), x => x.cast("double") / col("__norm"))))
      .drop("__norm")

  /**
   * Symmetric per-vector int8 quantization: `scale = max|x| / 127`,
   * `q_i = round(x_i / scale)` in [-127, 127]. Returns the input plus
   * `scaleCol` (double) and `qCol` (array<int>). Zero vectors get
   * scale 0 and all-zero codes. Dequantization error is bounded by
   * scale/2 per coordinate; callers wanting tighter error use more
   * bits upstream, not this operator.
   */
  def quantizeInt8(df: DataFrame, vecCol: String,
                   qCol: String = "q_vec",
                   scaleCol: String = "q_scale"): DataFrame =
    df.withColumn(scaleCol,
        aggregate(col(vecCol), lit(0.0),
          (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0)
      .withColumn(qCol,
        when(col(scaleCol) === 0.0,
          transform(col(vecCol), _ => lit(0)))
          .otherwise(transform(col(vecCol),
            x => round(x.cast("double") / col(scaleCol), 0).cast("int"))))

  /**
   * Mean-pool vectors per group — the chunk-embeddings → document-
   * embedding (or per-class centroid) aggregation every retrieval
   * pipeline runs after chunked encoding. Output one row per group:
   * `(groupCol, n, vecCol)` with the component-wise mean as
   * `array<double>` and `n` the pooled vector count.
   *
   * Scale shape (the [[Similarity]] `groupMeans` discipline): ONE
   * `posexplode` → per-(group, dim) partial-aggregated means — state
   * is groups × dims scalars, a whole-group vector LIST never sits in
   * any buffer — then a per-group `array_sort(collect_list(struct))`
   * reassembly whose per-group size is exactly the dimension count
   * (bounded by the model, not the data; the packedText contract-safe
   * collect class). Vectors of differing lengths within a group
   * mean-pool per-dimension as far as each dimension has values —
   * mixed-model groups are a caller bug this surfaces as ragged
   * output rather than silently truncating. A group whose vectors are
   * ALL null/empty still emits its row (`n = 0`, vector null) — a
   * pooled frame must cover every input group, or downstream joins
   * silently lose those documents.
   */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val exploded = df.select(col(groupCol),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("__pos", "__x")))
      .groupBy(col(groupCol), col("__pos"))
      .agg(avg(col("__x")).as("__m"), count(lit(1)).as("__cnt"))
    val pooled = exploded.groupBy(col(groupCol))
      .agg(max(col("__cnt")).as("n"),
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__m")))),
          s => s.getField("__m")).as(vecCol))
    df.select(col(groupCol)).distinct()
      .join(pooled, Seq(groupCol), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }
}
