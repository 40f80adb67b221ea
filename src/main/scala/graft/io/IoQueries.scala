package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** IO / provenance queries + DuckDB oracles (SURVEY §2.1). */
object IoQueries {

  /** Extension-dispatch load of the customer parquet. */
  def ioLoadParquet(s: SparkSession, dir: String): DataFrame =
    Loaders.load(s, s"$dir/customer.parquet")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  val ioLoadParquetOracle: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey""".stripMargin

  /** Provenance load: key-derived unique id + dataset/source columns. */
  def ioProvenance(s: SparkSession, dir: String): DataFrame =
    Loaders.withProvenance(
        customer(s, dir).select("c_custkey", "c_name", "c_acctbal"),
        "customer", "c_custkey", "customer.parquet")
      .orderBy("c_custkey")

  val ioProvenanceOracle: String =
    """SELECT 'customer-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS customer_id,
      |       c_custkey, c_name, c_acctbal,
      |       'customer' AS __dataset_name,
      |       'customer.parquet' AS __source_path
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** Nested-record flatten: build a nested struct view of customer, then
    * flatten back to `parent_child` columns.
    */
  def ioFlatten(s: SparkSession, dir: String): DataFrame = {
    val nested = customer(s, dir).select(
      col("c_custkey").as("id"),
      struct(
        col("c_name").as("name"),
        struct(col("c_mktsegment").as("segment"), col("c_nationkey").as("nation")).as("market"))
        .as("profile"),
      col("c_acctbal").as("balance"))
    Loaders.flatten(nested).orderBy("id")
  }

  val ioFlattenOracle: String =
    """SELECT c_custkey AS id, c_name AS profile_name,
      |       c_mktsegment AS profile_market_segment,
      |       c_nationkey AS profile_market_nation,
      |       c_acctbal AS balance
      |FROM customer
      |ORDER BY id""".stripMargin

  /** Delimited-column explode over part names. */
  def ioExplodeDelim(s: SparkSession, dir: String): DataFrame =
    Loaders.explodeDelimited(
        part(s, dir).select(col("p_partkey"), col("p_name")), "p_name", " ", "word")
      .select("p_partkey", "word")
      .orderBy("p_partkey", "word")

  val ioExplodeDelimOracle: String =
    """SELECT p_partkey, trim(unnest(string_split(p_name, ' '))) AS word
      |FROM part
      |ORDER BY p_partkey, word""".stripMargin

  /** Fixed-width round-trip: render customer rows as fixed-width lines
    * in-engine (no file side effects in the gate), then parse back with
    * the fwf column specs — exercises exactly load_fwf's slicing.
    */
  def ioFwf(s: SparkSession, dir: String): DataFrame = {
    val lines = customer(s, dir).select(
      concat(
        rpad(col("c_name"), 25, " "),
        lpad(col("c_custkey").cast("string"), 11, " "),
        rpad(col("c_mktsegment"), 12, " ")).as("line"))
    Loaders.parseFwf(lines, "line", Seq(
        ("name", 1, 25), ("custkey", 26, 11), ("segment", 37, 12)))
      .orderBy("custkey", "name")
  }

  val ioFwfOracle: String =
    """WITH t AS (SELECT rpad(c_name, 25, ' ') || lpad(CAST(c_custkey AS VARCHAR), 11, ' ')
      |             || rpad(c_mktsegment, 12, ' ') AS line FROM customer)
      |SELECT trim(substr(line, 1, 25)) AS name,
      |       trim(substr(line, 26, 11)) AS custkey,
      |       trim(substr(line, 37, 12)) AS segment
      |FROM t ORDER BY custkey, name""".stripMargin

  /** Round-trip: per-nation HTML tables built deterministically from
    * customer (header row + sorted data rows), parsed back by the
    * regex table reader.
    */
  def ioHtml(s: SparkSession, dir: String): DataFrame = {
    val docs = customer(s, dir)
      .select(col("c_nationkey"),
        concat(lit("<tr><td> "), col("c_name"), lit(" </td><td>"),
          col("c_custkey").cast("string"), lit("</td></tr>")).as("_tr"))
      .groupBy("c_nationkey")
      .agg(concat(lit("<table><tr><th>name</th><th>id</th></tr>"),
        array_join(array_sort(collect_list(col("_tr"))), ""),
        lit("</table>")).as("html"))
    Loaders.parseHtmlTable(docs, "html")
      .select(col("c_nationkey"), col("row_idx").cast("long").as("row_idx"),
        element_at(col("cells"), 1).as("name"),
        element_at(col("cells"), 2).as("id"))
      .orderBy("c_nationkey", "row_idx")
  }

  val ioHtmlOracle: String =
    """WITH tr AS (SELECT c_nationkey,
      |    '<tr><td> ' || c_name || ' </td><td>' || CAST(c_custkey AS VARCHAR)
      |      || '</td></tr>' AS tr
      |  FROM customer),
      |doc AS (SELECT c_nationkey,
      |    '<table><tr><th>name</th><th>id</th></tr>'
      |      || array_to_string(list_sort(list(tr)), '') || '</table>' AS html
      |  FROM tr GROUP BY c_nationkey),
      |ex AS (SELECT c_nationkey,
      |    unnest(regexp_extract_all(html, '(?s)<tr[^>]*>(.*?)</tr>', 1)) AS row_html,
      |    generate_subscripts(regexp_extract_all(html, '(?s)<tr[^>]*>(.*?)</tr>', 1), 1) AS rix
      |  FROM doc),
      |cells AS (SELECT c_nationkey, CAST(rix - 1 AS BIGINT) AS row_idx,
      |    [trim(regexp_replace(x, '<[^>]*>', '', 'g'))
      |     for x in regexp_extract_all(row_html, '(?s)<t[dh][^>]*>(.*?)</t[dh]>', 1)] AS cs
      |  FROM ex)
      |SELECT c_nationkey, row_idx, cs[1] AS name, cs[2] AS id
      |FROM cells ORDER BY c_nationkey, row_idx""".stripMargin

  /** Hive-partitioned sink + partition-pruned read-back: write the
    * documents table `partitionBy(source)` (the layout a 100 TB corpus
    * actually lands in — one directory per source, so source-scoped
    * jobs never list, let alone read, other sources' files), then read
    * it back filtered to 3 sources and aggregate. The filter is a
    * PARTITION filter — it prunes directories at planning time instead
    * of scanning+discarding (IoProfileSchemaSpec asserts the pruned
    * scan shape on the executed plan).
    */
  /** Collision-resistant token for the shared-tmpdir layout paths: md5
    * of the FULL data-dir string (r12 advice: `dir.hashCode` lets two
    * different dirs collide and silently share/overwrite each other's
    * layouts). Deliberately stable — NOT a per-session UUID — because
    * the write half (the registered query) and the read half (the spec
    * re-opening the layout to assert pruning) must compute the same
    * path; two sessions on the SAME dir sharing a layout is the
    * intended idempotent-overwrite contract.
    */
  private[graft] def dirToken(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString

  /** Where [[ioPartitioned]] lands its partitioned copy (exposed so the
    * spec can re-open the read and assert partition pruning on the
    * executed plan).
    */
  def partitionedPath(dir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_part_${dirToken(dir)}").toString

  def ioPartitioned(s: SparkSession, dir: String): DataFrame = {
    val out = partitionedPath(dir)
    documents(s, dir).write.mode("overwrite").partitionBy("source").parquet(out)
    s.read.parquet(out)
      .filter(col("source").isin("src1", "src2", "src3"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source")
  }

  val ioPartitionedOracle: String =
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |WHERE source IN ('src1', 'src2', 'src3')
      |GROUP BY source ORDER BY source""".stripMargin

  /** Where [[ioDppJoin]] lands its partitioned fact (exposed for the
    * spec's plan pin). */
  def dppPath(dir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_dpp_${dirToken(dir)}").toString

  /** DYNAMIC partition pruning, demonstrated on a real partitioned
    * layout — the third member of the pruning family (`io_partitioned`
    * = static partition pruning from a literal predicate;
    * `io_zorder_pruned` = file-stats skipping; this = pruning decided
    * AT RUNTIME from the other side of a join): orders written
    * partitioned by priority, joined to a small dim whose filter
    * (urgency_rank ≤ 2) lives on a dim-only DERIVED column — a
    * predicate the optimizer cannot statically translate onto the fact
    * scan, so only DPP can avoid reading the 3 non-urgent partitions:
    * Spark plants a `dynamicpruning` subquery in the fact scan's
    * partition filters, fed by the reused broadcast of the dim
    * (spec-pinned on the executed plan). At 100 TB this is the "scan
    * only the dates the dimension selects" pattern that decides whether
    * a star join reads 2 % or 100 % of the fact table.
    */
  def ioDppJoin(s: SparkSession, dir: String): DataFrame = {
    val out = dppPath(dir)
    orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    val fact = s.read.parquet(out)
    val urgent = orders(s, dir).select(col("o_orderpriority")).distinct()
      .select(col("o_orderpriority").as("p"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("urgency_rank"))
      .filter(col("urgency_rank") <= 2)
    fact.join(broadcast(urgent), fact("o_orderpriority") === urgent("p"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        centsToDouble(sum(cents(col("o_totalprice")))).as("revenue"))
      .orderBy("o_orderpriority")
  }

  val ioDppJoinOracle: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
      |         / 100.0 AS revenue
      |FROM orders
      |WHERE CAST(substr(o_orderpriority, 1, 1) AS INT) <= 2
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private def orcPath(dir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_orc_${dirToken(dir)}").toString

  /** ORC source roundtrip: write a lineitem projection as ORC (the
    * second columnar format large pipelines standardize on), read it
    * back, aggregate. The oracle aggregates the same logical rows from
    * parquet — identical results prove the format roundtrip is lossless.
    */
  def ioOrc(s: SparkSession, dir: String): DataFrame = {
    val out = orcPath(dir)
    lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("price_c"))
      .write.mode("overwrite").orc(out)
    s.read.orc(out)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("qty").as("sum_qty"),
        (sum("price_c").cast("double") / 100.0).as("sum_price"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val ioOrcOracle: String =
    """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
      |         AS sum_price
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private def compactPath(dir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_compact_${dirToken(dir)}").toString

  /** Target rows per output file for the compaction demo. In production
    * the knob is bytes (`maxRecordsPerFile` / target file size); rows
    * keep the invariant SQL-checkable.
    */
  val CompactTargetRows = 200L

  /** Small-file compaction: rewrite the documents table into
    * ⌈rows / target⌉ evenly-sized files (round-robin repartition — at
    * 100 TB this is the nightly job that keeps file counts from
    * exploding past the NameNode/manifest budget). Output is the
    * SQL-checkable invariant: file count written = ⌈rows / target⌉ and
    * no rows lost.
    */
  def ioCompact(s: SparkSession, dir: String): DataFrame = {
    val out = compactPath(dir)
    val docs = documents(s, dir)
    val rows = docs.count()
    val k = math.max(1L, (rows + CompactTargetRows - 1) / CompactTargetRows).toInt
    docs.repartition(k).write.mode("overwrite").parquet(out)
    s.read.parquet(out)
      .select(input_file_name().as("f"), col("doc_id"))
      .agg(countDistinct("f").as("n_files"), count(lit(1)).as("n_rows"),
        countDistinct("doc_id").as("n_docs"))
  }

  val ioCompactOracle: String =
    s"""SELECT CAST(ceil(CAST(count(*) AS DOUBLE) / $CompactTargetRows) AS BIGINT) AS n_files,
       |       CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
       |FROM documents""".stripMargin

  private def evolvePath(dir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_evolve_${dirToken(dir)}").toString

  /** Schema-evolution read: two parquet batches with different schemas
    * (v2 adds a column) merged by `mergeSchema` into one unified view —
    * the additive-evolution pattern every long-lived 100 TB dataset
    * hits. Old rows surface NULL for the new column; the oracle is the
    * explicit UNION the merged scan is sugar for.
    */
  def ioMergeSchema(s: SparkSession, dir: String): DataFrame = {
    val out = evolvePath(dir)
    val docs = documents(s, dir)
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/batch=v1")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
      .write.mode("overwrite").parquet(s"$out/batch=v2")
    // v1 rows surface NULL lang; coalesce to '' so the sort key is
    // NULL-free (Spark and DuckDB default NULL orderings differ).
    s.read.option("mergeSchema", "true").parquet(out)
      .groupBy(col("batch"), coalesce(col("lang"), lit("")).as("lang"))
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))
      .orderBy("batch", "lang")
  }

  val ioMergeSchemaOracle: String =
    """WITH u AS (
      |  SELECT doc_id, source, n_chars, CAST(NULL AS VARCHAR) AS lang, 'v1' AS batch
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT doc_id, source, n_chars, lang, 'v2' AS batch
      |  FROM documents WHERE doc_id % 2 = 1)
      |SELECT batch, coalesce(lang, '') AS lang, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM u GROUP BY 1, 2 ORDER BY batch, lang""".stripMargin

  /** Morton (Z-order) interleave of two `bits`-bit non-negative ints:
    * x occupies even bit positions, y odd. Pure shift/mask arithmetic —
    * identical in Spark and DuckDB.
    */
  private def morton(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column =
    (0 until bits).map(i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)))
      .reduce(_ bitwiseOR _)

  private def sqlMorton(x: String, y: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " | ", ")")

  /** Z-order data-skipping layout, measured: customers keyed by
    * (nation-bucket, balance-bucket) — both bucketed to the same 4-bit
    * width — are laid out once by Morton code and
    * once by single-column sort, each split into 16 equal chunks (the
    * row-group stand-in); per chunk we report each dimension's min/max
    * — the exact stats a parquet reader prunes row groups with. The
    * Z-layout bounds BOTH dimensions per chunk; the single-column sort
    * leaves the other dimension full-range — why 100 TB tables
    * Z-order their top filter columns before writing. All-integer
    * (bucket law shared with the oracle), custkey tie-break makes both
    * orderings total. The global ntile window is the AUDIT-sized demo
    * (dimension-bounded input); the production write path gets the
    * same layout from `repartitionByRange(z).sortWithinPartitions(z)`
    * — no single-task sort.
    */
  def ioZorder(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // EQUAL bit-widths per dimension (4 + 4 -> a 16×16 grid): Morton
    // only tiles when the dims interleave evenly — a 5-bit nation
    // against an 8-bit balance would be dominated by the wider dim's
    // high bits (measured: worse than a plain sort).
    val base = customer(s, dir).select(
      col("c_custkey").as("id"),
      expr("CAST(c_nationkey AS BIGINT) * 16 div 25").as("nat"),
      // acctbal in [-999.99, 9999.99] -> 0..15 bucket, exact int law
      expr("(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) * 16 div 1200000")
        .as("bal"))
      .withColumn("z", morton(col("nat"), col("bal"), 4))
    def chunks(ordered: DataFrame, layout: String, ord: Seq[org.apache.spark.sql.Column]) =
      ordered
        .withColumn("chunk", ntile(16).over(Window.orderBy(ord: _*)).cast("long"))
        .groupBy("chunk")
        .agg(min("nat").as("min_nat"), max("nat").as("max_nat"),
          min("bal").as("min_bal"), max("bal").as("max_bal"))
        .select(lit(layout).as("layout"), col("chunk"),
          col("min_nat"), col("max_nat"), col("min_bal"), col("max_bal"),
          (col("max_nat") - col("min_nat") + col("max_bal") - col("min_bal"))
            .as("span"))
    chunks(base, "zorder", Seq(col("z"), col("id")))
      .unionAll(chunks(base, "single", Seq(col("bal"), col("id"))))
      .orderBy("layout", "chunk")
  }

  val ioZorderOracle: String = {
    val m = sqlMorton("nat", "bal", 4)
    s"""WITH base AS (
       |  SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) * 16 // 25 AS nat,
       |         (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) * 16 // 1200000 AS bal
       |  FROM customer),
       |z AS (SELECT *, $m AS z FROM base),
       |cz AS (SELECT nat, bal, ntile(16) OVER (ORDER BY z, id) AS chunk FROM z),
       |cs AS (SELECT nat, bal, ntile(16) OVER (ORDER BY bal, id) AS chunk FROM z),
       |az AS (SELECT 'zorder' AS layout, CAST(chunk AS BIGINT) AS chunk,
       |         min(nat) AS min_nat, max(nat) AS max_nat,
       |         min(bal) AS min_bal, max(bal) AS max_bal
       |       FROM cz GROUP BY 2),
       |asg AS (SELECT 'single' AS layout, CAST(chunk AS BIGINT) AS chunk,
       |         min(nat) AS min_nat, max(nat) AS max_nat,
       |         min(bal) AS min_bal, max(bal) AS max_bal
       |       FROM cs GROUP BY 2)
       |SELECT layout, chunk, min_nat, max_nat, min_bal, max_bal,
       |       (max_nat - min_nat + max_bal - min_bal) AS span
       |FROM (SELECT * FROM az UNION ALL SELECT * FROM asg)
       |ORDER BY layout, chunk""".stripMargin
  }

  /** Where [[ioZorderPruned]] lands its two layouts (exposed so the
    * spec can re-open the selective read and assert the pushed-filter
    * scan shape on the executed plan).
    */
  def zorderPath(dir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_zorder_${dirToken(dir)}").toString

  /** Z-order pruning MEASURED on real parquet files (the claim
    * `io_zorder` proves on chunk stats, cashed on disk): both layouts
    * are written as 16 actual parquet files (one per chunk — the
    * row-group/file stand-in a Delta/Iceberg data-skipping index
    * stats), then per-FILE min/max is derived by reading the files
    * back and grouping by `input_file_name()` — stats from the bytes
    * on disk, not from the plan. For two predicates — a 2-D box
    * (nat = 7 AND bal IN [4,7], the z-order win) and a 1-D range
    * (bal IN [4,7], the single-sort win) — the frame reports how many
    * files a stats-aware reader MUST read (file ranges overlapping the
    * predicate box) out of the 16 total, next to the matching row
    * count. The oracle predicts the same numbers from the layout law
    * alone (chunk ≡ file), so the hash gate proves the written layout
    * realizes the predicted pruning. Both predicates ship because the
    * trade is the lesson: Z bounds both dimensions per file (few files
    * for the box, slightly more for the 1-D range); the single sort is
    * optimal for its own column and unable to prune the other.
    */
  def ioZorderPruned(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = customer(s, dir).select(
      col("c_custkey").as("id"),
      expr("CAST(c_nationkey AS BIGINT) * 16 div 25").as("nat"),
      expr("(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) * 16 div 1200000")
        .as("bal"))
      .withColumn("z", morton(col("nat"), col("bal"), 4))
    val out = zorderPath(dir)
    def write(layout: String, ord: Seq[org.apache.spark.sql.Column]): Unit =
      base.withColumn("chunk",
          ntile(16).over(Window.orderBy(ord: _*)).cast("long"))
        .select("id", "nat", "bal", "chunk")
        .repartition(1) // one task -> exactly one file per chunk dir
        .write.mode("overwrite").partitionBy("chunk")
        .parquet(s"$out/$layout")
    write("zorder", Seq(col("z"), col("id")))
    write("single", Seq(col("bal"), col("id")))
    def measure(layout: String): DataFrame = {
      val r = s.read.parquet(s"$out/$layout")
        .select(col("nat"), col("bal"), input_file_name().as("_f"))
      val boxRow = col("nat") === 7 && col("bal").between(4, 7)
      val balRow = col("bal").between(4, 7)
      val natRow = col("nat") === 7
      val fileStats = r.groupBy("_f").agg(
        min("nat").as("_mn"), max("nat").as("_xn"),
        min("bal").as("_mb"), max("bal").as("_xb"))
      val boxFile = col("_mn") <= 7 && col("_xn") >= 7 &&
        col("_mb") <= 7 && col("_xb") >= 4
      val balFile = col("_mb") <= 7 && col("_xb") >= 4
      val natFile = col("_mn") <= 7 && col("_xn") >= 7
      val files = fileStats.agg(count(lit(1)).as("_total"),
        sum(when(boxFile, 1L).otherwise(0L)).as("_fbox"),
        sum(when(balFile, 1L).otherwise(0L)).as("_fbal"),
        sum(when(natFile, 1L).otherwise(0L)).as("_fnat"))
      val rows = r.agg(sum(when(boxRow, 1L).otherwise(0L)).as("_rbox"),
        sum(when(balRow, 1L).otherwise(0L)).as("_rbal"),
        sum(when(natRow, 1L).otherwise(0L)).as("_rnat"))
      // unpivot via explode-of-structs: ONE pass over each 1-row agg
      files.crossJoin(rows)
        .select(explode(array(
          struct(lit("box").as("pred"), col("_total").as("n_files_total"),
            col("_fbox").as("n_files_read"), col("_rbox").as("n_rows_matched")),
          struct(lit("bal_range").as("pred"), col("_total").as("n_files_total"),
            col("_fbal").as("n_files_read"), col("_rbal").as("n_rows_matched")),
          struct(lit("nat_eq").as("pred"), col("_total").as("n_files_total"),
            col("_fnat").as("n_files_read"), col("_rnat").as("n_rows_matched"))))
          .as("_s"))
        .select(lit(layout).as("layout"), col("_s.pred"),
          col("_s.n_files_total"), col("_s.n_files_read"),
          col("_s.n_rows_matched"))
    }
    measure("zorder").unionAll(measure("single")).orderBy("layout", "pred")
  }

  val ioZorderPrunedOracle: String = {
    val m = sqlMorton("nat", "bal", 4)
    s"""WITH base AS (
       |  SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) * 16 // 25 AS nat,
       |         (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) * 16 // 1200000 AS bal
       |  FROM customer),
       |z AS (SELECT *, $m AS z FROM base),
       |cz AS (SELECT nat, bal, ntile(16) OVER (ORDER BY z, id) AS chunk FROM z),
       |cs AS (SELECT nat, bal, ntile(16) OVER (ORDER BY bal, id) AS chunk FROM z),
       |fz AS (SELECT chunk, min(nat) mn, max(nat) xn, min(bal) mb, max(bal) xb
       |       FROM cz GROUP BY 1),
       |fs AS (SELECT chunk, min(nat) mn, max(nat) xn, min(bal) mb, max(bal) xb
       |       FROM cs GROUP BY 1),
       |rows_m AS (SELECT
       |    CAST(sum(CASE WHEN nat = 7 AND bal BETWEEN 4 AND 7 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS rbox,
       |    CAST(sum(CASE WHEN bal BETWEEN 4 AND 7 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS rbal,
       |    CAST(sum(CASE WHEN nat = 7 THEN 1 ELSE 0 END) AS BIGINT) AS rnat
       |  FROM base),
       |agg_z AS (SELECT CAST(count(*) AS BIGINT) AS total,
       |    CAST(sum(CASE WHEN mn <= 7 AND xn >= 7 AND mb <= 7 AND xb >= 4
       |      THEN 1 ELSE 0 END) AS BIGINT) AS fbox,
       |    CAST(sum(CASE WHEN mb <= 7 AND xb >= 4 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fbal,
       |    CAST(sum(CASE WHEN mn <= 7 AND xn >= 7 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fnat
       |  FROM fz),
       |agg_s AS (SELECT CAST(count(*) AS BIGINT) AS total,
       |    CAST(sum(CASE WHEN mn <= 7 AND xn >= 7 AND mb <= 7 AND xb >= 4
       |      THEN 1 ELSE 0 END) AS BIGINT) AS fbox,
       |    CAST(sum(CASE WHEN mb <= 7 AND xb >= 4 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fbal,
       |    CAST(sum(CASE WHEN mn <= 7 AND xn >= 7 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fnat
       |  FROM fs)
       |SELECT layout, pred, n_files_total, n_files_read, n_rows_matched FROM (
       |  SELECT 'zorder' AS layout, 'box' AS pred, total AS n_files_total,
       |         fbox AS n_files_read, rbox AS n_rows_matched FROM agg_z, rows_m
       |  UNION ALL
       |  SELECT 'zorder', 'bal_range', total, fbal, rbal FROM agg_z, rows_m
       |  UNION ALL
       |  SELECT 'zorder', 'nat_eq', total, fnat, rnat FROM agg_z, rows_m
       |  UNION ALL
       |  SELECT 'single', 'box', total, fbox, rbox FROM agg_s, rows_m
       |  UNION ALL
       |  SELECT 'single', 'bal_range', total, fbal, rbal FROM agg_s, rows_m
       |  UNION ALL
       |  SELECT 'single', 'nat_eq', total, fnat, rnat FROM agg_s, rows_m)
       |ORDER BY layout, pred""".stripMargin
  }

  private def csvPath(dir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_csv_${dirToken(dir)}").toString

  /** CSV roundtrip under adversarial content: every document is
    * prefixed with an embedded quote, comma and newline (the characters
    * that break naive CSV), written with RFC-style quote-doubling
    * (escape = quote), read back with an explicit schema + multiLine.
    * Output: per-doc md5 of the read-back text — the oracle computes
    * the same md5 from parquet, so one mangled character fails the
    * hash. multiLine is the one CSV option that is NOT splittable
    * (records cross line boundaries) — the documented reason parquet,
    * not CSV, is the at-scale interchange format.
    */
  def ioCsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = csvPath(dir)
    documents(s, dir)
      .select(col("doc_id"),
        concat(lit("a\"b,c\nd "), col("text")).as("t2"))
      .write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(out)
    s.read
      .schema("doc_id LONG, t2 STRING")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .csv(out)
      .select(col("doc_id"), md5(col("t2")).as("text_md5"),
        length(col("t2")).cast("long").as("n_chars"))
      .orderBy("doc_id")
  }

  val ioCsvRoundtripOracle: String =
    """SELECT doc_id,
      |       md5('a"b,c' || chr(10) || 'd ' || text) AS text_md5,
      |       CAST(length('a"b,c' || chr(10) || 'd ' || text) AS BIGINT) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Snapshot diff (the data-reconciliation tool every pipeline runs
    * after a backfill): two table versions full-outer-joined on the
    * key, rows classified added / removed / changed / unchanged by
    * content digest. ONE key shuffle regardless of table width (the
    * digest folds all compared columns), counts-bounded output. The
    * v2 snapshot is derived deterministically (drop key%10=7, rewrite
    * text for key%10=3, insert key+10⁶ for key%10=0) so every status
    * appears.
    */
  def ioTableDiff(s: SparkSession, dir: String): DataFrame = {
    val a = documents(s, dir).select(col("doc_id"), col("text"), col("lang"), col("source"))
    val b0 = a.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 3, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"),
        col("lang"), col("source"))
    val b = b0.unionByName(
      a.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"), col("lang"), col("source")))
    def dig(df: DataFrame, name: String) = df.select(col("doc_id"),
      md5(concat_ws("\u0001", col("text"), col("lang"), col("source"))).as(name))
    dig(a, "ha").join(dig(b, "hb"), Seq("doc_id"), "full")
      .select(when(col("ha").isNull, "added")
        .when(col("hb").isNull, "removed")
        .when(col("ha") === col("hb"), "unchanged")
        .otherwise("changed").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
  }

  val ioTableDiffOracle: String =
    """WITH a AS (
      |  SELECT doc_id, md5(concat_ws(chr(1), text, lang, source)) AS ha
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    md5(concat_ws(chr(1),
      |      CASE WHEN doc_id % 10 = 3 THEN text || ' v2' ELSE text END,
      |      lang, source)) AS hb
      |  FROM documents WHERE doc_id % 10 <> 7
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |    md5(concat_ws(chr(1), text, lang, source))
      |  FROM documents WHERE doc_id % 10 = 0),
      |j AS (
      |  SELECT CASE WHEN a.ha IS NULL THEN 'added'
      |              WHEN b.hb IS NULL THEN 'removed'
      |              WHEN a.ha = b.hb THEN 'unchanged'
      |              ELSE 'changed' END AS status
      |  FROM a FULL JOIN b USING (doc_id))
      |SELECT status, CAST(count(*) AS BIGINT) AS n
      |FROM j GROUP BY status ORDER BY status""".stripMargin

  private def jsonlPath(dir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_jsonl_${dirToken(dir)}").toString

  /** JSONL roundtrip — THE training-data interchange format: documents
    * written as newline-delimited JSON (with the same embedded
    * quote/backslash/newline prefix the CSV test plants — JSON escapes
    * them in-record, so JSONL STAYS splittable, the reason it beats
    * CSV at 100 TB), read back with an explicit schema (no inference
    * scan), verified by per-doc md5 against the parquet side.
    */
  def ioJsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = jsonlPath(dir)
    documents(s, dir)
      .select(col("doc_id"),
        concat(lit("a\"b\\c\nd "), col("text")).as("t2"), col("lang"))
      .write.mode("overwrite").json(out)
    s.read.schema("doc_id LONG, t2 STRING, lang STRING").json(out)
      .select(col("doc_id"), md5(col("t2")).as("text_md5"),
        length(col("t2")).cast("long").as("n_chars"), col("lang"))
      .orderBy("doc_id")
  }

  val ioJsonlRoundtripOracle: String =
    """SELECT doc_id,
      |       md5('a"b\c' || chr(10) || 'd ' || text) AS text_md5,
      |       CAST(length('a"b\c' || chr(10) || 'd ' || text) AS BIGINT) AS n_chars,
      |       lang
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Where [[ioBucketedJoin]] lands its bucketed layouts (exposed so the
    * spec can rebuild the join frame and assert the shuffle-free plan).
    */
  def bucketedPath(dir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_bucketed_${dirToken(dir)}").toString

  /** Catalog-unique bucketed table name for `dir`. */
  def bucketedTable(side: String, dir: String): String =
    s"graft_bkt_${side}_${java.lang.Integer.toHexString(dir.hashCode)}"

  /** Write both join sides bucketed on the join key and return the
    * joined frames (customer ⋈ orders on custkey), for [[ioBucketedJoin]]
    * and its plan-shape spec. Each side is written ONCE per call as 8
    * bucket files (repartition(1) → one task → exactly one file per
    * bucket), sorted within buckets, registered as external tables in
    * the session catalog. With both sides bucketed by the same key into
    * the same bucket count, Catalyst's EnsureRequirements sees matching
    * HashPartitioning on both children and inserts NO Exchange under the
    * sort-merge join — the co-located-join contract that at 100 TB turns
    * the nightly fact⋈dim re-shuffle (the single largest cost in a
    * repeated-join pipeline) into a local merge per bucket. The `merge`
    * hint pins SMJ so the demonstration doesn't degenerate to a
    * broadcast at test SF; at scale neither side broadcasts anyway.
    */
  def bucketedJoinFrame(s: SparkSession, dir: String): DataFrame = {
    val base = bucketedPath(dir)
    val nb = 8
    Bucketing.saveBucketedAt(
      customer(s, dir).select("c_custkey", "c_mktsegment", "c_acctbal"),
      bucketedTable("cust", dir), "c_custkey", nb, s"$base/customer")
    Bucketing.saveBucketedAt(
      orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
      bucketedTable("ord", dir), "o_custkey", nb, s"$base/orders")
    val c = s.table(bucketedTable("cust", dir))
    val o = s.table(bucketedTable("ord", dir))
    c.hint("merge").join(o, c("c_custkey") === o("o_custkey"))
  }

  /** Bucketed co-located join, end to end: write → catalog → shuffle-free
    * SMJ → aggregate. The OUTPUT is the ordinary revenue-per-segment
    * frame (bucketing must never change answers — that is the oracle's
    * check, plain SQL over the original parquet); the plan is the
    * payload (spec-pinned: zero shuffles below the join, vs two for the
    * same join over the raw files).
    */
  def ioBucketedJoin(s: SparkSession, dir: String): DataFrame =
    bucketedJoinFrame(s, dir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("revenue"))
      .orderBy("c_mktsegment")

  val ioBucketedJoinOracle: String =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
      |         AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Where [[ioZorderCompact]] lands its three layouts. */
  def zorderCompactPath(dir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_zcompact_${dirToken(dir)}").toString

  /** Z-order COMPACTION, measured on real files (the SURVEY §15
    * candidate: appends erode z-locality; restore it by re-clustering
    * ONLY the affected key range). The base layout holds every customer
    * outside nation 12, written as the 16-chunk z-order layout of
    * `io_zorder_pruned`; nation 12's rows then "arrive" as 4
    * arrival-ordered append files — a LOCALIZED arrival (the scenario
    * compaction exists for: one region/tenant/day lands at a time),
    * each append file unclustered in z, so a stats-aware reader must
    * read every append file whose stats cover the predicate: the
    * erosion (sf0.01 box read: 8 of 20 files vs 4 of 16 after repair). Compaction assigns each appended row to
    * the base chunk whose z upper bound covers its z code (first
    * chunk with ub ≥ z; past the last bound → chunk 16) and rewrites
    * ONLY the affected chunks — base files outside the affected set are
    * left byte-untouched on disk (they are read back filtered by
    * partition-pruned chunk ids, never rewritten). The frame reports,
    * for the 2-D box and the 1-D range predicate, the files a
    * stats-aware reader must read in the post-append vs post-compact
    * layout (per-file min/max derived via input_file_name() from the
    * bytes), plus the compaction bill: files_rewritten = |affected
    * chunks| out of 16 (a full re-sort rewrites all 16 + 4). The oracle
    * PREDICTS every number from the layout law alone, so the hash gate
    * proves the written layouts realize the predicted erosion AND the
    * predicted repair. At 100 TB this is Delta/Iceberg OPTIMIZE with a
    * key-range scope: the affected-chunk set is metadata-scale (≤
    * #chunks ids, collected like the other grid-bounded sets), and the
    * rewrite touches only partitions whose z-range received appends.
    */
  def ioZorderCompact(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all0 = customer(s, dir).select(
      col("c_custkey").as("id"),
      col("c_nationkey"),
      expr("CAST(c_nationkey AS BIGINT) * 16 div 25").as("nat"),
      expr("(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) * 16 div 1200000")
        .as("bal"))
      .withColumn("z", morton(col("nat"), col("bal"), 4))
    // LOCALIZED arrival (one nation's rows) — the scenario compaction
    // exists for; a uniform append would touch every chunk's z-range
    // and the "affected range only" scope would degenerate to a full
    // rewrite (measured: 16/16 affected for a %5 split)
    val base = all0.filter(col("c_nationkey") =!= 12)
      .withColumn("chunk", ntile(16).over(Window.orderBy(col("z"), col("id"))).cast("long"))
    val appends = all0.filter(col("c_nationkey") === 12)
      .withColumn("afile", ntile(4).over(Window.orderBy(col("id"))).cast("long"))
    val out = zorderCompactPath(dir)
    base.select("id", "nat", "bal", "z", "chunk")
      .repartition(1).write.mode("overwrite").partitionBy("chunk")
      .parquet(s"$out/base")
    appends.select("id", "nat", "bal", "z", "afile")
      .repartition(1).write.mode("overwrite").partitionBy("afile")
      .parquet(s"$out/appends")
    // chunk z upper bounds from the written base (16 rows — metadata)
    val baseBack = s.read.parquet(s"$out/base")
    val bounds = baseBack.groupBy("chunk").agg(max("z").as("_ub"))
    val appBack = s.read.parquet(s"$out/appends")
    val assigned = appBack
      .join(broadcast(bounds), col("z") <= col("_ub"), "left")
      .groupBy("id", "nat", "bal", "z")
      .agg(coalesce(min("chunk"), lit(16L)).as("chunk"))
    val affected = assigned.select("chunk").distinct()
      .collect().map(_.getLong(0)).sorted // ≤ 16 ids — metadata-scale
    baseBack.filter(col("chunk").isin(affected: _*))
      .select("id", "nat", "bal", "z", "chunk")
      .unionByName(assigned.select("id", "nat", "bal", "z", "chunk"))
      .repartition(1).write.mode("overwrite").partitionBy("chunk")
      .parquet(s"$out/compact")
    val rewritten = s.read.parquet(s"$out/compact")
    def measure(phase: String, r: DataFrame): DataFrame = {
      val boxFile = col("_mn") <= 7 && col("_xn") >= 7 &&
        col("_mb") <= 7 && col("_xb") >= 4
      val balFile = col("_mb") <= 7 && col("_xb") >= 4
      val fileStats = r
        .select(col("nat"), col("bal"), input_file_name().as("_f"))
        .groupBy("_f").agg(
          min("nat").as("_mn"), max("nat").as("_xn"),
          min("bal").as("_mb"), max("bal").as("_xb"))
      val files = fileStats.agg(count(lit(1)).as("_total"),
        sum(when(boxFile, 1L).otherwise(0L)).as("_fbox"),
        sum(when(balFile, 1L).otherwise(0L)).as("_fbal"))
      val rows = r.agg(
        sum(when(col("nat") === 7 && col("bal").between(4, 7), 1L)
          .otherwise(0L)).as("_rbox"),
        sum(when(col("bal").between(4, 7), 1L).otherwise(0L)).as("_rbal"))
      files.crossJoin(rows) // 1 row × 1 row
        .select(explode(array(
          struct(lit("box").as("pred"), col("_total").as("n_files_total"),
            col("_fbox").as("n_files_read"), col("_rbox").as("n_rows_matched")),
          struct(lit("bal_range").as("pred"), col("_total").as("n_files_total"),
            col("_fbal").as("n_files_read"), col("_rbal").as("n_rows_matched"))))
          .as("_s"))
        .select(lit(phase).as("phase"), col("_s.pred"),
          col("_s.n_files_total"), col("_s.n_files_read"),
          col("_s.n_rows_matched"))
    }
    val postAppend = measure("post_append", baseBack.unionByName(
      appBack.withColumnRenamed("afile", "chunk")))
    val postCompact = measure("post_compact",
      baseBack.filter(!col("chunk").isin(affected: _*)).unionByName(rewritten))
    val bill = rewritten.agg(
        countDistinct("chunk").as("n_files_read"),
        count(lit(1)).as("n_rows_matched"))
      .select(lit("rewrite").as("phase"), lit("cost").as("pred"),
        lit(16L).as("n_files_total"), col("n_files_read"),
        col("n_rows_matched"))
    postAppend.unionByName(postCompact).unionByName(bill)
      .orderBy("phase", "pred")
  }

  /** [[ioZorderCompactOracle]] minus its final ORDER BY — shared with
    * the `io_compact_policy` oracle, which wraps the whole measurement
    * as a derived table and computes the trigger decision over it.
    */
  private val ioZorderCompactOracleBody: String = {
    val m = sqlMorton("nat", "bal", 4)
    s"""WITH all0 AS (
       |  SELECT c_custkey AS id, c_nationkey,
       |         CAST(c_nationkey AS BIGINT) * 16 // 25 AS nat,
       |         (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) * 16 // 1200000 AS bal
       |  FROM customer),
       |z AS (SELECT *, $m AS z FROM all0),
       |base AS (SELECT *, CAST(ntile(16) OVER (ORDER BY z, id) AS BIGINT) AS chunk
       |         FROM z WHERE c_nationkey <> 12),
       |app AS (SELECT *, CAST(ntile(4) OVER (ORDER BY id) AS BIGINT) AS afile
       |        FROM z WHERE c_nationkey = 12),
       |bounds AS (SELECT chunk, max(z) AS ub FROM base GROUP BY 1),
       |assigned AS (SELECT a.id, a.nat, a.bal, a.z,
       |               coalesce(min(b.chunk), 16) AS chunk
       |             FROM app a LEFT JOIN bounds b ON a.z <= b.ub
       |             GROUP BY a.id, a.nat, a.bal, a.z),
       |aff AS (SELECT DISTINCT chunk FROM assigned),
       |pa_files AS (
       |  SELECT 'b' || CAST(chunk AS VARCHAR) AS f, nat, bal FROM base
       |  UNION ALL SELECT 'a' || CAST(afile AS VARCHAR), nat, bal FROM app),
       |pc_files AS (
       |  SELECT 'b' || CAST(chunk AS VARCHAR) AS f, nat, bal FROM base
       |  WHERE chunk NOT IN (SELECT chunk FROM aff)
       |  UNION ALL
       |  SELECT 'c' || CAST(chunk AS VARCHAR), nat, bal FROM (
       |    SELECT chunk, nat, bal FROM base
       |    WHERE chunk IN (SELECT chunk FROM aff)
       |    UNION ALL SELECT chunk, nat, bal FROM assigned)),
       |rows_m AS (SELECT
       |    CAST(sum(CASE WHEN nat = 7 AND bal BETWEEN 4 AND 7 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS rbox,
       |    CAST(sum(CASE WHEN bal BETWEEN 4 AND 7 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS rbal
       |  FROM all0),
       |pa_stats AS (SELECT f, min(nat) mn, max(nat) xn, min(bal) mb, max(bal) xb
       |             FROM pa_files GROUP BY 1),
       |pc_stats AS (SELECT f, min(nat) mn, max(nat) xn, min(bal) mb, max(bal) xb
       |             FROM pc_files GROUP BY 1),
       |pa_agg AS (SELECT CAST(count(*) AS BIGINT) AS total,
       |    CAST(sum(CASE WHEN mn <= 7 AND xn >= 7 AND mb <= 7 AND xb >= 4
       |      THEN 1 ELSE 0 END) AS BIGINT) AS fbox,
       |    CAST(sum(CASE WHEN mb <= 7 AND xb >= 4 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fbal
       |  FROM pa_stats),
       |pc_agg AS (SELECT CAST(count(*) AS BIGINT) AS total,
       |    CAST(sum(CASE WHEN mn <= 7 AND xn >= 7 AND mb <= 7 AND xb >= 4
       |      THEN 1 ELSE 0 END) AS BIGINT) AS fbox,
       |    CAST(sum(CASE WHEN mb <= 7 AND xb >= 4 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS fbal
       |  FROM pc_stats),
       |bill AS (SELECT CAST(count(DISTINCT chunk) AS BIGINT) AS n_files_read,
       |    (SELECT CAST(count(*) AS BIGINT) FROM base
       |     WHERE chunk IN (SELECT chunk FROM aff))
       |    + CAST(count(*) AS BIGINT) AS n_rows_matched
       |  FROM assigned)
       |SELECT phase, pred, n_files_total, n_files_read, n_rows_matched FROM (
       |  SELECT 'post_append' AS phase, 'box' AS pred, total AS n_files_total,
       |         fbox AS n_files_read, rbox AS n_rows_matched FROM pa_agg, rows_m
       |  UNION ALL
       |  SELECT 'post_append', 'bal_range', total, fbal, rbal FROM pa_agg, rows_m
       |  UNION ALL
       |  SELECT 'post_compact', 'box', total, fbox, rbox FROM pc_agg, rows_m
       |  UNION ALL
       |  SELECT 'post_compact', 'bal_range', total, fbal, rbal FROM pc_agg, rows_m
       |  UNION ALL
       |  SELECT 'rewrite', 'cost', 16, n_files_read, n_rows_matched FROM bill)""".stripMargin
  }

  val ioZorderCompactOracle: String =
    ioZorderCompactOracleBody + "\nORDER BY phase, pred"

  /** Bill-aware compaction trigger (r13, the OPTIMIZE-trigger policy as
    * a query — completes the z-order lifecycle after `io_zorder_pruned`
    * measures the layout and `io_zorder_compact` measures
    * erosion/repair/bill): per predicate shape, the DECISION to compact
    * is computed from the two already-measured layouts — files read on
    * the eroded (post-append) layout vs on the repaired (post-compact)
    * layout — as exact integer laws: `regression_milli` = relative
    * extra files read per query because of the erosion,
    * `break_even_queries` = how many queries of this shape pay back the
    * rewrite bill (ceil(rewrite_files / files_saved)), and the trigger
    * itself swept at two SLO thresholds (300 / 1500 milli) so the
    * output is non-degenerate: at sf0.01 both predicates trigger at
    * 300 (regressions 1000 and 666) and neither at 1500 — the decision
    * is a FUNCTION of the threshold, the same shape
    * `match_threshold_pick` reports its picks in. At
    * 100 TB this is the nightly OPTIMIZE scheduler: erosion and bill
    * are metadata-scale reads (file stats), the decision frame is
    * predicate-count rows, and nothing row-scale moves until the
    * trigger fires — the compaction itself then rewrites only the
    * affected z-interval (io_zorder_compact's scope).
    */
  def ioCompactPolicy(s: SparkSession, dir: String): DataFrame = {
    val m = ioZorderCompact(s, dir)
    val e = m.filter(col("phase") === "post_append")
      .select(col("pred"), col("n_files_total").as("eroded_total"),
        col("n_files_read").as("eroded_files"))
    val r = m.filter(col("phase") === "post_compact")
      .select(col("pred"), col("n_files_total").as("repaired_total"),
        col("n_files_read").as("repaired_files"))
    val b = m.filter(col("phase") === "rewrite")
      .select(col("n_files_read").as("rewrite_files"))
    val saved = col("eroded_files") - col("repaired_files")
    val reg = expr("(eroded_files - repaired_files) * 1000 div repaired_files")
    e.join(r, "pred").crossJoin(broadcast(b))
      .select(col("pred"), col("eroded_total"), col("eroded_files"),
        col("repaired_total"), col("repaired_files"),
        saved.as("files_saved"), reg.as("regression_milli"),
        expr("eroded_files * 1000 div repaired_files")
          .as("read_amp_before_milli"),
        expr("repaired_files * 1000 div repaired_files")
          .as("read_amp_after_milli"),
        col("rewrite_files"),
        when(saved > lit(0L),
          expr("(rewrite_files + eroded_files - repaired_files - 1) " +
            "div (eroded_files - repaired_files)"))
          .as("break_even_queries"),
        (reg >= 300).as("compact_at_300"),
        (reg >= 1500).as("compact_at_1500"))
      .orderBy("pred")
  }

  val ioCompactPolicyOracle: String =
    s"""WITH m AS (SELECT * FROM ($ioZorderCompactOracleBody) t),
       |e AS (SELECT pred, n_files_total AS eroded_total,
       |             n_files_read AS eroded_files
       |      FROM m WHERE phase = 'post_append'),
       |r AS (SELECT pred, n_files_total AS repaired_total,
       |             n_files_read AS repaired_files
       |      FROM m WHERE phase = 'post_compact'),
       |b AS (SELECT n_files_read AS rewrite_files FROM m
       |      WHERE phase = 'rewrite')
       |SELECT e.pred, eroded_total, eroded_files, repaired_total,
       |  repaired_files,
       |  eroded_files - repaired_files AS files_saved,
       |  (eroded_files - repaired_files) * 1000 // repaired_files
       |    AS regression_milli,
       |  eroded_files * 1000 // repaired_files AS read_amp_before_milli,
       |  repaired_files * 1000 // repaired_files AS read_amp_after_milli,
       |  rewrite_files,
       |  CASE WHEN eroded_files > repaired_files
       |       THEN (rewrite_files + eroded_files - repaired_files - 1)
       |            // (eroded_files - repaired_files)
       |       ELSE NULL END AS break_even_queries,
       |  (eroded_files - repaired_files) * 1000 // repaired_files >= 300
       |    AS compact_at_300,
       |  (eroded_files - repaired_files) * 1000 // repaired_files >= 1500
       |    AS compact_at_1500
       |FROM e JOIN r USING (pred) CROSS JOIN b
       |ORDER BY pred""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "io_bucketed_join" -> (ioBucketedJoin _),
    "io_zorder_compact" -> (ioZorderCompact _),
    "io_compact_policy" -> (ioCompactPolicy _),
    "io_dpp_join" -> (ioDppJoin _),
    "io_jsonl_roundtrip" -> (ioJsonlRoundtrip _),
    "io_table_diff" -> (ioTableDiff _),
    "io_csv_roundtrip" -> (ioCsvRoundtrip _),
    "io_zorder" -> (ioZorder _),
    "io_zorder_pruned" -> (ioZorderPruned _),
    "io_orc" -> (ioOrc _),
    "io_compact" -> (ioCompact _),
    "io_merge_schema" -> (ioMergeSchema _),
    "io_partitioned" -> (ioPartitioned _),
    "io_html" -> (ioHtml _),
    "io_fwf" -> (ioFwf _),
    "io_load_parquet" -> (ioLoadParquet _),
    "io_provenance" -> (ioProvenance _),
    "io_flatten" -> (ioFlatten _),
    "io_explode_delim" -> (ioExplodeDelim _)
  )

  def oracles: Map[String, String] = Map(
    "io_bucketed_join" -> ioBucketedJoinOracle,
    "io_zorder_compact" -> ioZorderCompactOracle,
    "io_compact_policy" -> ioCompactPolicyOracle,
    "io_dpp_join" -> ioDppJoinOracle,
    "io_jsonl_roundtrip" -> ioJsonlRoundtripOracle,
    "io_table_diff" -> ioTableDiffOracle,
    "io_csv_roundtrip" -> ioCsvRoundtripOracle,
    "io_zorder" -> ioZorderOracle,
    "io_zorder_pruned" -> ioZorderPrunedOracle,
    "io_orc" -> ioOrcOracle,
    "io_compact" -> ioCompactOracle,
    "io_merge_schema" -> ioMergeSchemaOracle,
    "io_partitioned" -> ioPartitionedOracle,
    "io_html" -> ioHtmlOracle,
    "io_fwf" -> ioFwfOracle,
    "io_load_parquet" -> ioLoadParquetOracle,
    "io_provenance" -> ioProvenanceOracle,
    "io_flatten" -> ioFlattenOracle,
    "io_explode_delim" -> ioExplodeDelimOracle
  )
}
