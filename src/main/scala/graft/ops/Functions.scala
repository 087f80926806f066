package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY §2.7 F3-F9, §2.2 P4-P5, plus the
  * JSON/array extension the driver's `events.props` column brings in).
  *
  * Every query here is pure projection/aggregation of codegen'd built-ins
  * — no UDFs — so Catalyst keeps the whole pipeline inside one
  * WholeStageCodegen span and column pruning reaches the parquet scan.
  */
object Functions {

  /** F10-ext: JSON field extraction from the events `props` column
    * (`get_json_object` — the engine's `from_json`-family surface),
    * aggregated per event_type.
    */
  def jsonProps(events: DataFrame): DataFrame =
    events
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k_val")).as("n_with_k"),
        sum(col("k_val")).as("sum_k"),
        min(col("k_val")).as("min_k"),
        max(col("k_val")).as("max_k"))

  /** F3/F4: timestamp decomposition + formatting + fixed-offset shift (the
    * reference's `parse_timezone('+07:00')`, `components/utils/utils.py:
    * 4-26`) on the events stream.
    */
  def dateParts(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      year(col("ts")).as("y"),
      month(col("ts")).as("mo"),
      dayofmonth(col("ts")).as("d"),
      hour(col("ts")).as("h"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
      unix_millis(col("ts")).as("epoch_ms"),
      date_format(col("ts") + expr("INTERVAL 7 HOURS"), "yyyy-MM-dd HH").as("ts_plus7"))

  /** F5/F6: regexp_replace + regexp_extract (extension swap / basename
    * extraction, `components/utils/file_utils.py:60,103`) over documents.
    */
  def regexFuncs(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      regexp_extract(col("source"), "[0-9]+", 0).cast("long").as("src_num"),
      regexp_replace(col("source"), "^src", "source-").as("src_renamed"),
      length(regexp_replace(col("text"), "\\s+", "")).as("n_nonspace"))

  /** F7: concat_ws over a collected (sorted, deduplicated) group — the
    * reference's `" + ".join(used_files)` (`training.py:88`). Sorting the
    * set makes the result deterministic under any shuffle order.
    */
  def concatAgg(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("lang"))
      .agg(
        concat_ws(",", array_sort(collect_set(col("source")))).as("sources"),
        countDistinct(col("source")).as("n_sources"))

  /** P4/P1/P2/F2: casts + arithmetic projection over lineitem. */
  def castProject(lineitem: DataFrame): DataFrame =
    lineitem.select(
      col("l_orderkey"),
      col("l_linenumber").cast("long").as("linenum_l"),
      col("l_quantity").cast("int").as("qty_int"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
        (lit(1.0) + col("l_tax"))).as("charged"),
      date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))

  /** P5/A9: null/validity predicate + non-empty guard as one diagnostic
    * row (`data_utils.py:51-53`, `duckdb2csv.py:11-12`).
    */
  def nullGuard(events: DataFrame): DataFrame =
    events.agg(
      count(lit(1)).as("n_total"),
      count(col("value")).as("n_value_nonnull"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_value_null"),
      max(when(col("value").isNotNull, col("value"))).as("max_nonnull"))
}
