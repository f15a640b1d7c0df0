package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.T._

/** Semi-structured processing: JSON payload round-trips and array
  * higher-order functions — the column shapes an ingestion engine
  * (reference S6: JSON API scans) needs at query time, all codegen'd
  * built-ins. Each engine serializes and re-parses ITS OWN JSON, so
  * the comparison is on extracted values (shortest-roundtrip double
  * printing makes the text→double trip lossless in both).
  */
object SemiStructured {

  /** JSON extraction: a nested payload (struct + array) serialized
    * with to_json, fields pulled back out with JSONPath — the
    * store-raw-JSON-and-extract-late pattern. Path access never
    * re-parses the document per field in either engine worth noting;
    * the plan stays one projection, no shuffle.
    */
  val q49 = Q("q49_json_extract",
    (s, dir) => {
      load(s, dir, "orders")
        .select(col("o_orderkey"),
          to_json(struct(col("o_custkey").as("cust"),
            col("o_totalprice").as("total"),
            col("o_orderpriority").as("prio"),
            array(col("o_totalprice"), col("o_totalprice") * 2).as("arr")))
            .as("payload"))
        .select(col("o_orderkey"),
          get_json_object(col("payload"), "$.cust").cast("long").as("cust"),
          get_json_object(col("payload"), "$.total").cast("double").as("total"),
          get_json_object(col("payload"), "$.prio").as("prio"),
          get_json_object(col("payload"), "$.arr[1]").cast("double").as("arr1"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      WITH payloads AS (
        SELECT o_orderkey,
          to_json(struct_pack(cust := o_custkey, total := o_totalprice,
            prio := o_orderpriority,
            arr := [o_totalprice, o_totalprice * 2])) AS payload
        FROM orders)
      SELECT o_orderkey,
        CAST(json_extract_string(payload, '$.cust') AS BIGINT) AS cust,
        CAST(json_extract_string(payload, '$.total') AS DOUBLE) AS total,
        json_extract_string(payload, '$.prio') AS prio,
        CAST(json_extract_string(payload, '$.arr[1]') AS DOUBLE) AS arr1
      FROM payloads ORDER BY o_orderkey"""))

  /** Array higher-order functions over the embedding column: L2 norm,
    * mean, positive-count, max — aggregate/filter lambdas that stay
    * inside whole-stage codegen (never a UDF, never an explode+groupBy
    * round trip: an explode would shuffle dim× the rows to recompute
    * per-vector scalars). Arrays cast to double BEFORE the lambdas so
    * both engines accumulate identical doubles in index order.
    */
  val q50 = Q("q50_array_hof",
    (s, dir) => {
      load(s, dir, "embeddings")
        .withColumn("e", col("embedding").cast("array<double>"))
        .select(col("vec_id"),
          round(sqrt(aggregate(col("e"), lit(0.0d), (a, x) => a + x * x)), 6).as("l2"),
          round(aggregate(col("e"), lit(0.0d), (a, x) => a + x) / size(col("e")), 6).as("mean"),
          size(filter(col("e"), x => x > 0)).cast("long").as("n_pos"),
          round(array_max(col("e")), 6).as("vmax"))
        .orderBy(col("vec_id"))
    },
    Some("""
      SELECT vec_id,
        ROUND(sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b)), 6) AS l2,
        ROUND(list_reduce(e, (a, b) -> a + b) / len(e), 6) AS mean,
        CAST(len(list_filter(e, x -> x > 0)) AS BIGINT) AS n_pos,
        ROUND(list_max(e), 6) AS vmax
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) t
      ORDER BY vec_id"""))

  /** VARIANT shredding (Spark 4's semi-structured type): the raw JSON
    * `props` column parsed once into an open VARIANT value, typed
    * fields extracted with `variant_get`, then aggregated — the
    * parse-once/shred-late pattern that replaces per-field
    * `get_json_object` re-parses (one binary-encoded parse per row,
    * every field access a cheap path lookup into it). Sums are exact
    * integer arithmetic, so the DuckDB JSON oracle hash-matches.
    */
  val q66 = Q("q66_variant_shred",
    (s, dir) => {
      load(s, dir, "events")
        .select(col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "bigint").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(col("k")).as("n_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, COUNT(*) AS n, COUNT(k) AS n_k,
             MIN(k) AS min_k, MAX(k) AS max_k,
             CAST(SUM(k) AS BIGINT) AS sum_k
      FROM (SELECT event_type,
              CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events) t
      GROUP BY event_type ORDER BY event_type"""))

  def qs: Seq[Q] = Seq(q49, q50, q66)
}
