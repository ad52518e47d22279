package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar function surface — SURVEY.md §2.7 (string / date / math / array /
  * map / json). Everything is `org.apache.spark.sql.functions._` builtins —
  * fully whole-stage-codegen'd, zero UDFs — so each query is a single
  * narrow-dependency scan stage at any scale.
  *
  * Dialect traps encoded in the oracles (cost one debug cycle each if
  * rediscovered): Spark `log` is ln (DuckDB `log` is log10 — use `ln`);
  * Spark `regexp_replace` replaces all matches (DuckDB needs the 'g' flag);
  * Spark `ceil/floor` return LONG (DuckDB keeps DOUBLE — cast); Spark
  * `posexplode` is 0-based (DuckDB `generate_subscripts` is 1-based);
  * int-returning Spark funcs (year, size, datediff) are cast to long to
  * match DuckDB's BIGINT.
  */
object Scalars {
  private type Q = (SparkSession, String) => DataFrame

  /** concat / substring / case / trim / split / regexp / levenshtein. */
  val fnString: Q = (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        concat(col("p_brand"), lit(":"), upper(col("p_name"))).as("brand_name"),
        substring(col("p_name"), 1, 5).as("name5"),
        lower(trim(col("p_type"))).as("type_lc"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
        levenshtein(col("p_brand"), lit("Brand#1")).cast("long").as("lev"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"))
      .orderBy(col("p_partkey"))

  /** date_trunc / extract / datediff / date_add / epoch. */
  val fnDate: Q = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mon"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate"))
          .cast("long").as("days_to_2002"),
        date_add(col("o_orderdate"), 30).cast("timestamp").as("plus_30d"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  /** round / abs / ceil / floor / ln / pow / pmod / try_divide. */
  val fnMath: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("price_r1"),
        round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
        ceil(col("l_quantity")).as("qty_ceil"),
        floor(col("l_quantity")).as("qty_floor"),
        round(log(col("l_extendedprice")), 4).as("ln_price"),
        round(pow(col("l_discount"), 2), 6).as("disc_sq"),
        pmod(col("l_orderkey"), lit(7)).as("okey_mod7"),
        round(try_divide(col("l_extendedprice"), col("l_tax")), 2).as("price_per_tax"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Bitwise operators + popcount — hash partitioning, bucket masks, and
    * bitset membership at scale are all bit arithmetic; all codegen'd.
    */
  val fnBitwise: Q = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("and_255"),
        col("o_orderkey").bitwiseOR(lit(4096L)).as("or_4096"),
        col("o_orderkey").bitwiseXOR(lit(1365L)).as("xor_1365"),
        shiftleft(col("o_orderkey"), 3).as("shl3"),
        shiftright(col("o_orderkey"), 2).as("shr2"),
        bit_count(col("o_orderkey")).cast("long").as("popcount"))
      .orderBy(col("o_orderkey"))

  /** NULL-handling conditional family: coalesce / nullif / nvl2 /
    * greatest / least — the building blocks of defaulting and guard logic
    * in every ETL mapping; NULLs are synthesized deterministically.
    */
  val fnConditional: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("maybe_price",
        when(pmod(col("o_orderkey"), lit(5)) === 0, col("o_totalprice")))
      .select(
        col("o_orderkey"),
        round(coalesce(col("maybe_price"), lit(-1.0)), 2).as("price_or_default"),
        nullif(col("o_orderstatus"), lit("O")).as("status_non_open"),
        expr("nvl2(maybe_price, 'present', 'absent')").as("presence"),
        round(greatest(col("o_totalprice"), lit(100000.0)), 2).as("at_least_100k"),
        round(least(col("o_totalprice"), lit(100000.0)), 2).as("at_most_100k"))
      .orderBy(col("o_orderkey"))

  /** Struct (nested record) operations: create, field access, nested
    * struct, struct comparison for min/max — the typed-record shape every
    * nested-format pipeline (XML/JSON/protobuf) flows through.
    */
  val fnStruct: Q = (s, d) => {
    val rec = struct(
      col("n_regionkey").as("rk"),
      struct(col("n_nationkey").as("id"), col("n_name").as("name")).as("nation"))
    Tables.nation(s, d)
      .withColumn("rec", rec)
      .groupBy(col("rec.rk").as("regionkey"))
      .agg(
        min(col("rec.nation.name")).as("first_name"),
        max(struct(col("rec.nation.id").as("id"),
          col("rec.nation.name").as("name"))).as("max_rec"),
        count(lit(1)).as("n"))
      .select(col("regionkey"), col("first_name"),
        col("max_rec.id").as("max_id"), col("max_rec.name").as("max_name"),
        col("n"))
      .orderBy(col("regionkey"))
  }

  /** URL parsing (host/path/query-param extraction) — web-corpus curation
    * runs this per document; URLs are synthesized per-row from customer so
    * the extraction oracles against the source columns by construction.
    */
  val fnUrl: Q = (s, d) =>
    Tables.customer(s, d)
      .withColumn("url", concat(
        lit("https://example.com/seg"), pmod(col("c_custkey"), lit(7)),
        lit("/page?uid="), col("c_custkey"), lit("&seg="), col("c_mktsegment")))
      .select(
        col("c_custkey"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("uid")).as("uid"),
        parse_url(col("url"), lit("QUERY"), lit("seg")).as("seg"))
      .orderBy(col("c_custkey"))

  /** Array ops + lambda HOFs + posexplode, over whitespace-tokenized text.
    * HOFs (`transform`/`filter`/`aggregate`) run inside codegen — this is
    * the "functions, not UDFs" path for per-document token math at 100 TB.
    */
  val fnArray: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("words", split(col("text"), " "))
      .withColumn("sorted_distinct", sort_array(array_distinct(col("words"))))
      .select(
        col("doc_id"),
        posexplode(slice(col("sorted_distinct"), 1, 3)).as(Seq("pos", "word")),
        size(col("words")).cast("long").as("n_words"),
        size(filter(col("words"), w => length(w) > 5)).cast("long").as("long_words"),
        aggregate(col("words"), lit(0L), (acc, w) => acc + length(w)).as("total_chars"),
        array_contains(col("words"), "data").as("has_data"))
      .withColumn("pos", col("pos").cast("long") + 1)
      .select(col("doc_id"), col("pos"), col("word"), col("n_words"),
        col("long_words"), col("total_chars"), col("has_data"))
      .orderBy(col("doc_id"), col("pos"))

  /** Map creation / keys / values / element_at / explode-to-rows. */
  val fnMap: Q = (s, d) => {
    val m = Tables.orders(s, d)
      .withColumn("m", map(
        lit("status"), col("o_orderstatus"),
        lit("priority"), col("o_orderpriority")))
    m.select(
        col("o_orderkey"),
        explode(col("m")).as(Seq("k", "v")),
        element_at(col("m"), "status").as("status_val"),
        size(map_keys(col("m"))).cast("long").as("n_keys"))
      .select(col("o_orderkey"), col("k"), col("v"), col("status_val"), col("n_keys"))
      .orderBy(col("o_orderkey"), col("k"))
  }

  /** JSON: path extraction, schema-full parse, serialization, schema
    * inference — over the `events.props` payloads.
    */
  val fnJson: Q = (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_by_path"),
        from_json(col("props"), lit("k BIGINT")).getField("k").as("k_by_schema"),
        to_json(struct(col("event_id"), col("event_type"))).as("as_json"),
        schema_of_json(lit("""{"k": 87}""")).as("inferred_schema"))
      .orderBy(col("event_id"))

  /** Cryptographic digest family: md5 / sha2-256 over single columns and
    * canonical concatenations — content fingerprints, dedup keys, and
    * partition-stable shard ids all reduce to these. Codegen builtins; a
    * digest scan stays a single narrow stage at any scale.
    */
  val fnHash: Q = (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        md5(col("p_name")).as("name_md5"),
        sha2(col("p_name"), 256).as("name_sha256"),
        md5(concat_ws("|", col("p_brand"), col("p_type"))).as("bt_md5"),
        substring(sha2(col("p_type"), 256), 1, 8).as("type_sha8"))
      .orderBy(col("p_partkey"))

  /** Regex family: extract / extract_all / count / replace / split_part /
    * boolean match — the workhorses of log parsing and text normalization.
    * Patterns stay in the RE2 ∩ java.util.regex common subset (no
    * lookaround) so the DuckDB oracle is running the *same* language.
    */
  val fnRegex: Q = (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        array_join(
          regexp_extract_all(col("p_name"), lit("\\b[a-z]{6,}\\b"), lit(0)),
          ",").as("long_words"),
        regexp_count(col("p_name"), lit("a")).cast("long").as("n_a"),
        regexp_replace(col("p_type"), "\\s+", "_").as("type_snake"),
        split_part(col("p_name"), lit(" "), lit(2)).as("second_word"),
        col("p_name").rlike("green|blue").as("has_color"))
      .orderBy(col("p_partkey"))

  def queries: Map[String, Q] = Map(
    "fn_hash" -> fnHash,
    "fn_regex" -> fnRegex,
    "fn_string" -> fnString,
    "fn_date" -> fnDate,
    "fn_math" -> fnMath,
    "fn_bitwise" -> fnBitwise,
    "fn_url" -> fnUrl,
    "fn_conditional" -> fnConditional,
    "fn_struct" -> fnStruct,
    "fn_array" -> fnArray,
    "fn_map" -> fnMap,
    "fn_json" -> fnJson
  )

  def oracles: Map[String, String] = Map(
    "fn_hash" ->
      """SELECT p_partkey,
        | md5(p_name) AS name_md5,
        | sha256(p_name) AS name_sha256,
        | md5(p_brand || '|' || p_type) AS bt_md5,
        | substring(sha256(p_type), 1, 8) AS type_sha8
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_regex" ->
      """SELECT p_partkey,
        | regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        | coalesce(array_to_string(regexp_extract_all(p_name, '\b[a-z]{6,}\b'),
        |   ','), '') AS long_words,
        | CAST(len(regexp_extract_all(p_name, 'a')) AS BIGINT) AS n_a,
        | regexp_replace(p_type, '\s+', '_', 'g') AS type_snake,
        | split_part(p_name, ' ', 2) AS second_word,
        | regexp_matches(p_name, 'green|blue') AS has_color
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_string" ->
      """SELECT p_partkey,
        | p_brand || ':' || upper(p_name) AS brand_name,
        | substring(p_name, 1, 5) AS name5,
        | lower(trim(p_type)) AS type_lc,
        | regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
        | levenshtein(p_brand, 'Brand#1') AS lev,
        | len(string_split(p_name, ' ')) AS n_words
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_date" ->
      """SELECT o_orderkey,
        | date_trunc('month', o_orderdate) AS month_start,
        | year(o_orderdate) AS yr,
        | month(o_orderdate) AS mon,
        | day(o_orderdate) AS dom,
        | datediff('day', o_orderdate, DATE '2002-01-01') AS days_to_2002,
        | o_orderdate + INTERVAL 30 DAY AS plus_30d,
        | epoch_us(o_orderdate) // 1000000 AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice, 1) AS price_r1,
        | round(abs(l_discount - 0.05), 4) AS disc_dev,
        | CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        | CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        | round(ln(l_extendedprice), 4) AS ln_price,
        | round(pow(l_discount, 2), 6) AS disc_sq,
        | l_orderkey % 7 AS okey_mod7,
        | round(l_extendedprice / nullif(l_tax, 0), 2) AS price_per_tax
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "fn_bitwise" ->
      """SELECT o_orderkey,
        | o_orderkey & 255 AS and_255,
        | o_orderkey | 4096 AS or_4096,
        | xor(o_orderkey, 1365) AS xor_1365,
        | o_orderkey << 3 AS shl3,
        | o_orderkey >> 2 AS shr2,
        | CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_conditional" ->
      """WITH m AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |   CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice END AS maybe_price
        |  FROM orders)
        |SELECT o_orderkey,
        | round(coalesce(maybe_price, -1.0), 2) AS price_or_default,
        | nullif(o_orderstatus, 'O') AS status_non_open,
        | CASE WHEN maybe_price IS NOT NULL THEN 'present' ELSE 'absent' END
        |   AS presence,
        | round(greatest(o_totalprice, 100000.0), 2) AS at_least_100k,
        | round(least(o_totalprice, 100000.0), 2) AS at_most_100k
        |FROM m ORDER BY o_orderkey""".stripMargin,

    "fn_struct" ->
      """WITH x AS (
        |  SELECT n_regionkey AS regionkey, min(n_name) AS first_name,
        |   max(n_nationkey) AS max_id, count(*) AS n
        |  FROM nation GROUP BY 1)
        |SELECT regionkey, first_name, max_id,
        | (SELECT n_name FROM nation WHERE n_nationkey = max_id) AS max_name, n
        |FROM x ORDER BY regionkey""".stripMargin,

    "fn_url" ->
      """SELECT c_custkey,
        | 'example.com' AS host,
        | '/seg' || (c_custkey % 7) || '/page' AS path,
        | CAST(c_custkey AS VARCHAR) AS uid,
        | c_mktsegment AS seg
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_array" ->
      """WITH base AS (
        |  SELECT doc_id,
        |   string_split(text, ' ') AS words,
        |   list_sort(list_distinct(string_split(text, ' '))) AS sd
        |  FROM documents)
        |SELECT doc_id,
        | generate_subscripts(sd[1:3], 1) AS pos,
        | unnest(sd[1:3]) AS word,
        | len(words) AS n_words,
        | len(list_filter(words, w -> length(w) > 5)) AS long_words,
        | CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT) AS total_chars,
        | list_contains(words, 'data') AS has_data
        |FROM base ORDER BY doc_id, pos""".stripMargin,

    "fn_map" ->
      """WITH m AS (SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders)
        |SELECT * FROM (
        |  SELECT o_orderkey, 'status' AS k, o_orderstatus AS v,
        |    o_orderstatus AS status_val, CAST(2 AS BIGINT) AS n_keys FROM m
        |  UNION ALL
        |  SELECT o_orderkey, 'priority' AS k, o_orderpriority AS v,
        |    o_orderstatus AS status_val, CAST(2 AS BIGINT) AS n_keys FROM m)
        |ORDER BY o_orderkey, k""".stripMargin,

    "fn_json" ->
      """SELECT event_id,
        | CAST(props->>'k' AS BIGINT) AS k_by_path,
        | CAST(props->>'k' AS BIGINT) AS k_by_schema,
        | '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}' AS as_json,
        | 'STRUCT<k: BIGINT>' AS inferred_schema
        |FROM events ORDER BY event_id""".stripMargin
  )
}
