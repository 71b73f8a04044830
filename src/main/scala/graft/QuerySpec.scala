package graft

/**
 * Query-spec ADT — the reference's real "IR".
 *
 * The reference (visualfabriq/parquery) models a query as three plain lists:
 * `groupby_cols`, `measure_cols` (triples `[input, op, output]` after
 * normalization, `parquery/tool.py:181-204`) and `data_filter` (triples
 * `[col, op, values]`, `parquery/aggregate_duckdb.py:369-402`). Here the same
 * model is a small sealed ADT compiled to Spark `Column` expressions, making
 * the operator set exhaustive at compile time (the reference raises
 * `NotImplementedError` at runtime instead).
 */
sealed abstract class AggOp(val name: String)

object AggOp {
  /** `SUM(col)` — `parquery/aggregate_duckdb.py:305`. */
  case object Sum extends AggOp("sum")

  /** `AVG(col)` — `parquery/aggregate_duckdb.py:306-307` (`mean`/`avg`). */
  case object Mean extends AggOp("mean")

  /**
   * Sample standard deviation. The reference engines diverge (DuckDB
   * `STDDEV` = sample, PyArrow kernel default = population,
   * SURVEY.md §2.3/A3); we pin to sample (ddof=1) which matches the
   * DuckDB oracle used by the verify harness.
   */
  case object Std extends AggOp("std")

  /** Non-null count — `parquery/aggregate_duckdb.py:310`. */
  case object Count extends AggOp("count")

  /**
   * Count of NULL values per the reference README contract
   * (`README.md:61`). Note the reference's DuckDB engine actually maps
   * this to plain `COUNT` (a bug, `parquery/aggregate_duckdb.py:311`);
   * see [[Aggs.compile]]'s `countNaDuckdbCompat` flag.
   */
  case object CountNa extends AggOp("count_na")

  /** Exact distinct count — `parquery/aggregate_duckdb.py:312,328-329`. */
  case object CountDistinct extends AggOp("count_distinct")

  /** Legacy alias of [[CountDistinct]] — `parquery/aggregate_duckdb.py:313`. */
  case object SortedCountDistinct extends AggOp("sorted_count_distinct")

  /** `MIN(col)` — `parquery/aggregate_duckdb.py:314`. */
  case object Min extends AggOp("min")

  /** `MAX(col)` — `parquery/aggregate_duckdb.py:315`. */
  case object Max extends AggOp("max")

  /**
   * "Pick any value". The reference implements it as `MIN` on DuckDB
   * ("pick any value, MIN works", `parquery/aggregate_duckdb.py:316`);
   * we do the same so results are deterministic and oracle-stable.
   */
  case object One extends AggOp("one")

  val all: Seq[AggOp] = Seq(Sum, Mean, Std, Count, CountNa, CountDistinct,
    SortedCountDistinct, Min, Max, One)

  /** Parse op names incl. the `avg`/`stddev` aliases (SURVEY.md §2.3). */
  def parse(s: String): AggOp = s match {
    case "sum"                   => Sum
    case "mean" | "avg"          => Mean
    case "std" | "stddev"        => Std
    case "count"                 => Count
    case "count_na"              => CountNa
    case "count_distinct"        => CountDistinct
    case "sorted_count_distinct" => SortedCountDistinct
    case "min"                   => Min
    case "max"                   => Max
    case "one"                   => One
    case other => throw new IllegalArgumentException(
      s"Unknown aggregation operation '$other'; valid: " +
        all.map(_.name).mkString(", "))
  }
}

/** One measure: aggregate `input` with `op`, name the result `output`. */
final case class Measure(input: String, op: AggOp, output: String)

object Measure {
  /**
   * The reference's `normalize_measure_cols` (`parquery/tool.py:181-204`):
   * `[in]` → `(in, sum, in)`; `[in, op]` → `(in, op, in)`;
   * `[in, op, out]` → passthrough.
   */
  def normalize(specs: Seq[Seq[String]]): Seq[Measure] = specs.map {
    case Seq(in)          => Measure(in, AggOp.Sum, in)
    case Seq(in, op)      => Measure(in, AggOp.parse(op), in)
    case Seq(in, op, out) => Measure(in, AggOp.parse(op), out)
    case bad => throw new IllegalArgumentException(
      s"Measure spec must have 1..3 elements, got: $bad")
  }
}

/** Filter comparison operators — `parquery/aggregate_duckdb.py:369-402`. */
sealed abstract class FilterOp(val name: String)

object FilterOp {
  case object In    extends FilterOp("in")
  case object NotIn extends FilterOp("not in")
  case object Eq    extends FilterOp("==")
  case object Ne    extends FilterOp("!=")
  case object Gt    extends FilterOp(">")
  case object Ge    extends FilterOp(">=")
  case object Lt    extends FilterOp("<")
  case object Le    extends FilterOp("<=")

  val all: Seq[FilterOp] = Seq(In, NotIn, Eq, Ne, Gt, Ge, Lt, Le)

  def parse(s: String): FilterOp = s match {
    case "in"                  => In
    case "not in" | "nin"      => NotIn
    case "==" | "="            => Eq
    case "!="                  => Ne
    case ">"                   => Gt
    case ">="                  => Ge
    case "<"                   => Lt
    case "<="                  => Le
    case other => throw new IllegalArgumentException(
      s"Unknown filter operation '$other'; valid: " +
        all.map(_.name).mkString(", "))
  }
}

/**
 * One filter predicate. `value` is a scalar for the comparison ops, or a
 * `Seq`/`Array` for `in`/`not in` (a scalar there degrades to `==`/`!=`,
 * matching `parquery/aggregate_duckdb.py:373-384`). All filters in a query
 * are ANDed (`parquery/aggregate_duckdb.py:354`).
 */
final case class Filter(column: String, op: FilterOp, value: Any)

object Filter {
  def apply(column: String, op: String, value: Any): Filter =
    Filter(column, FilterOp.parse(op), value)
}
