package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.gen.SpanGen
import graft.kernel.{Chunker, Extractor}
import graft.multimodal.MediaOps
import graft.queries.{EntityLink, GraphOps, OcrOps, RetrievalOps, TrainingOps}
import graft.sources.MailIngest

/** Driver contract: one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the training-data ops), with a DuckDB oracle wherever the
  * operator is SQL-expressible. Column names/aliases match between the Spark
  * plan and the oracle SQL exactly (driver hash-compares after sorting
  * columns by name).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Materialized extraction output for the kernel-fed queries' oracles:
    * the 300-doc generated corpus extracted once, spans EXPLODED to scalar
    * rows (doc_id, seq, kind, text) and stored in the warehouse
    * (marker-gated — one build per warehouse, Materialize.onceAt). DuckDB
    * cannot replay the kernel, but it CAN replay every aggregation /
    * linking / chunking computation downstream of it — so dumping the
    * kernel's deterministic output puts those formerly rows-only queries
    * on the hash-compared oracle surface (VERDICT r4 #4): the oracle reads
    * this table (via __WAREHOUSE__, substituted by Verify) while the query
    * recomputes from the kernel, pinning recompute == stored == replayed.
    * The spans themselves are pinned by the kernel/golden parity suite. */
  /** FNV-1a64 fingerprint of an extractor's full 300-doc output (doc ids,
    * span order, kinds, texts — exactly what the scalar stores dump).
    * Folded into each store's `srcTag` so ANY semantic change to the
    * kernel (or golden) invalidates the marker-gated store automatically —
    * a version constant someone must remember to bump would let a stale
    * warehouse keep serving outdated spans to the linking queries AND
    * their oracles, and the hash gate would silently pass on stale data
    * (round-5 ADVICE #1). Driver-side over 300 generated docs (~30 ms),
    * computed once per JVM (deterministic, so a lazy val is sound). */
  private def extractorFingerprint(extract: graft.core.Doc => graft.core.Doc): String = {
    var h = 0xcbf29ce484222325L
    def mix(str: String): Unit = {
      var i = 0
      while (i < str.length) { h ^= str.charAt(i); h *= 0x100000001b3L; i += 1 }
      h ^= 0x1e; h *= 0x100000001b3L // field separator
    }
    (0L until 300L).foreach { i =>
      val doc = extract(SpanGen.genDoc(SpanGen.docId(i)))
      mix(doc.doc_id)
      doc.spans.foreach { sp =>
        mix(sp.kind); mix(sp.text); mix(sp.media_ref); mix(sp.offset.toString)
      }
    }
    java.lang.Long.toHexString(h)
  }
  private lazy val kernelFingerprint: String =
    extractorFingerprint(Extractor.extractDoc)
  private lazy val goldenFingerprint: String =
    extractorFingerprint(graft.golden.GoldenExtractor.extract)

  /** Shared dump shape for the two extractor stores: spans exploded to
    * scalar (doc_id, seq, kind, text, media_ref, offset) rows — ALL span
    * fields, so row-set equality of two stores is exactly struct-sequence
    * equality of the extractor outputs (the j5 verification join's
    * contract; the downstream linking/chunking oracles read only
    * kind/text/seq and are unaffected by the extra columns). */
  private def spanScalarStore(s: SparkSession, name: String, tag: String,
      extracted: => DataFrame): String = {
    val loc = graft.core.Materialize.warehousePath(s, name)
    // repartition(1): the 300-doc scalar dump is ~160 KB — without it the
    // 32-way extraction parallelism writes 32 tiny files and every store
    // consumer (the linking/graph/ex_* queries) pays a 32-task scan
    // (guide §6 small-files); extraction itself stays parallel upstream
    // of the single-writer exchange. Tag carries the layout so stores
    // written by earlier rounds rebuild.
    graft.core.Materialize.onceAt(s, loc, s"$tag:c1") {
      graft.core.TableIO.write(
        extracted.select(col("doc_id"),
            posexplode_outer(col("spans")).as(Seq("seq", "s")))
          .select(col("doc_id"), col("seq").cast("long").as("seq"),
            col("s.kind").as("kind"), col("s.text").as("text"),
            col("s.media_ref").as("media_ref"),
            col("s.offset").cast("long").as("offset"))
          .repartition(1),
        loc.toString)
    }
    loc.toString
  }

  private def extractSpansStore(s: SparkSession): String = {
    import s.implicits._
    spanScalarStore(s, "graft_extract_spans", s"gen:300:k$kernelFingerprint",
      s.range(0L, 300L)
        .map(i => Extractor.extractDoc(SpanGen.genDoc(SpanGen.docId(i)))).toDF())
  }

  /** The golden (independent, regex-engine) extractor's output over the
    * same 300-doc corpus, dumped to the same scalar shape. Exists ONLY so
    * `j5_golden_compare` — the kernel-vs-golden verification join — can be
    * replayed by DuckDB over the two stores (VERDICT r5 #4); the golden
    * IMPLEMENTATION stays independent, only its output is materialized. */
  private def goldenSpansStore(s: SparkSession): String = {
    import s.implicits._
    spanScalarStore(s, "graft_golden_spans", s"gen:300:g$goldenFingerprint",
      s.range(0L, 300L)
        .map(i => graft.golden.GoldenExtractor.extract(SpanGen.genDoc(SpanGen.docId(i)))).toDF())
  }

  /** Flagship: the extraction pipeline on a generated interleaved corpus —
    * per-kind span histogram. Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(0L, 300L).map(i => Extractor.extractDoc(SpanGen.genDoc(SpanGen.docId(i))))
      .select(explode($"spans").as("s"))
      .groupBy($"s.kind".as("kind")).agg(count("*").as("n"))
      .orderBy($"kind")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----------------------------------------------------------- flagship
    // TPC-H Q1-shaped pricing summary (SURVEY §2.4 A2/A4/A5)
    "q1_agg" -> ((s, d) => t(s, d, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        // quantized ratio (integer-valued sum / count) CAN land exactly on a
        // .xxxx5 boundary where Spark round() (shortest-decimal) and DuckDB
        // round() (binary) disagree — floor half-up is bit-identical in both
        (floor(avg(col("l_quantity")) * 1e4 + 0.5) / 1e4).as("avg_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // TPC-H Q3-shaped top-revenue orders (join + agg + top-k)
    "q3_top_orders" -> ((s, d) => {
      val c = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").where(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      val l = t(s, d, "lineitem").where(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    }),

    // ------------------------------------------------------ scans (§2.1)
    // S1/F1: ingest checksum + size guard
    "s1_ingest_checksum" -> ((s, d) => t(s, d, "documents")
      .where(col("n_chars") <= 300)
      .select(col("doc_id"), sha2(col("text"), 256).as("checksum"), col("n_chars"))
      .orderBy(col("doc_id"))),

    // S4: directory scan via binaryFile source + glob (ingest.py:188-222)
    "s4_dir_scan" -> ((s, d) => s.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet").load(d)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
        col("length"))
      .orderBy(col("file"))),

    // S3: email-attachment ingest (ingest.py:151-186) — render each doc as
    // a multipart message, walk MIME parts, skip containers/no-disposition,
    // decode payloads; oracle checks the per-message arithmetic face
    "s3_mail_attachments" -> ((s, d) =>
      MailIngest.perMessage(s, t(s, d, "documents")).orderBy(col("msg_id"))),

    // per-page OCR confidence structure + ConfidenceLevel bucketing
    // (ocr.py:84-109, models.py:95-99)
    "ocr_page_confidence" -> ((s, d) =>
      OcrOps.docConfidence(t(s, d, "documents")).orderBy(col("doc_id"))),

    // --------------------------------------- filters / projections (§2.2)
    // P1/O1: ilike OR search, ordered + limited (cli.py:788-797)
    "p1_ilike_search" -> ((s, d) => t(s, d, "documents")
      .where(lower(col("text")).contains("scan") || lower(col("source")).contains("rc1"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id")).limit(100)),

    // P2: equality filters on enum-ish columns
    "p2_eq_filter" -> ((s, d) => t(s, d, "documents")
      .where(col("lang") === "es" && col("source") === "src0")
      .select(col("doc_id"), col("n_chars")).orderBy(col("doc_id"))),

    // P3: status-set predicate (campaign.py:227-231)
    "p3_status_set" -> ((s, d) => t(s, d, "orders")
      .where(col("o_orderstatus").isin("F", "P"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))),

    // P6: derived predicates days_pending/is_overdue (models.py:231-241)
    "p6_derived_overdue" -> ((s, d) => t(s, d, "orders")
      .select((datediff(lit("2001-09-01").cast("timestamp"), col("o_orderdate")) > 365)
        .as("is_overdue"))
      .groupBy(col("is_overdue")).agg(count(lit(1)).as("n"))
      .orderBy(col("is_overdue"))),

    // ---------------------------------------------------------- joins (§2.3)
    // J1: FK navigation region→nation→customer→orders; dims broadcast
    "j1_fk_navigation" -> ((s, d) => t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("r_name"), col("n_name"))),

    // left_semi (EXISTS)
    "j2_semi_parts" -> ((s, d) => t(s, d, "part")
      .join(t(s, d, "lineitem"), col("p_partkey") === col("l_partkey"), "left_semi")
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n_parts"))
      .orderBy(col("p_brand"))),

    // left_anti (NOT EXISTS) — resume-filter shape (SURVEY §4.3);
    // customers with no order in the last window
    "j3_anti_customers" -> ((s, d) => t(s, d, "customer")
      .join(t(s, d, "orders").where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))),

    // co-located fact-fact join via bucketing (§4.2 scale pattern): both
    // sides written bucketBy+sortBy on the join key, then a merge join with
    // NO shuffle exchange on that key — the layout a 100 TB deployment uses
    // for repeated fact-fact joins (plan pinned shuffle-free by
    // BucketingSpec over this exact query; result oracled as a plain join)
    "j8_bucketed_join" -> ((s, d) => {
      // Build split from probe (VERDICT r4): the bucketed tables
      // materialize ONCE per source dir (marker-gated, like the signature
      // store), so repeated invocations — and the bench's min-of-reps —
      // time the shuffle-free merge join, not two bucketed writes. The
      // tables are EXTERNAL (explicit path): DROP TABLE never deletes the
      // files, and a fresh session re-registers the existing bucketed
      // layout with a CLUSTERED BY DDL instead of rewriting it.
      def ensure(tbl: String, ddlCols: String, key: String)(build: String => Unit): Unit = {
        val loc = graft.core.Materialize.warehousePath(s, tbl)
        val built = graft.core.Materialize.onceAt(s, loc, s"bucketed16:$d") {
          s.sql(s"DROP TABLE IF EXISTS $tbl") // stale entry from another source dir
          val fs = loc.getFileSystem(s.sessionState.newHadoopConf())
          if (fs.exists(loc)) fs.delete(loc, true)
          build(loc.toString)
        }
        if (!built && !s.catalog.tableExists(tbl))
          s.sql(s"""CREATE TABLE $tbl ($ddlCols) USING PARQUET
                   |CLUSTERED BY ($key) SORTED BY ($key) INTO 16 BUCKETS
                   |LOCATION '$loc'""".stripMargin)
      }
      ensure("graft_bkt_lineitem",
          "l_orderkey BIGINT, l_extendedprice DOUBLE, l_discount DOUBLE", "l_orderkey") { loc =>
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
          .write.mode("overwrite").option("path", loc)
          .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable("graft_bkt_lineitem")
      }
      ensure("graft_bkt_orders",
          "o_orderkey BIGINT, o_orderpriority STRING", "o_orderkey") { loc =>
        t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
          .write.mode("overwrite").option("path", loc)
          .bucketBy(16, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable("graft_bkt_orders")
      }
      s.table("graft_bkt_lineitem").hint("merge")
        .join(s.table("graft_bkt_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // skewed fact-fact join (§4.2 skew pattern, join flavor): ~30% of
    // lineitem rows funnel to ONE hot join key, which a plain shuffle join
    // serializes into a single reducer task; the explicit salted rewrite
    // (SkewJoin.saltedInner) splits the hot key across 8 (key, salt)
    // reducers. Row-identical to the plain join the oracle runs; salted
    // partitioning + plain-join equivalence + the AQE skew-split alternative
    // are pinned in SkewSpec. sum_qty sums integers (exact in double at any
    // reduction order) so the oracle compare is associativity-proof.
    "j9_skew_join" -> ((s, d) => {
      val fact = t(s, d, "lineitem")
        .withColumn("fk", when(pmod(col("l_orderkey"), lit(10)) < 3, lit(1L))
          .otherwise(col("l_orderkey")))
      val dim = t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      graft.queries.SkewJoin.saltedInner(fact, "fk",
          hash(col("l_partkey"), col("l_suppkey"), col("l_linenumber")),
          dim, "o_orderkey", nSalts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---------------------------------------------------- aggregates (§2.4)
    // A2: group-by counts (campaign.py:221-224)
    "a2_status_counts" -> ((s, d) => t(s, d, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))),

    // A3: dedup + argmax (extract.py:239-260 _merge_entities shape)
    "a3_argmax_doc" -> ((s, d) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id").asc)
      t(s, d, "documents").withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .orderBy(col("lang"))
    }),

    // A4: AVG with null guard (campaign.py:233-241)
    "a4_avg_value" -> ((s, d) => t(s, d, "events")
      .groupBy(col("event_type"))
      // value is cents-quantized (w3 relies on value*100 being integral),
      // so the avg sits on a 1/(100n) grid — same .xxxx5-boundary class as
      // q1_agg's avg_qty → floor half-up on both sides
      .agg((floor(avg(coalesce(col("value"), lit(0.0))) * 1e4 + 0.5) / 1e4).as("avg_value"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))),

    // A5: SUM of derived fee (campaign.py:244-245)
    "a5_revenue_by_flag" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("l_returnflag"))),

    // A6: ratio metrics (models.py:342-346)
    "a6_completion_ratio" -> ((s, d) => t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      // count ratio = quantized → floor half-up (see q1_agg avg_qty note)
      .agg((floor(sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("double") /
        count(lit(1)) * 1e4 + 0.5) / 1e4).as("completion_rate"), count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))),

    // A8: regex pattern-count aggregate (ocr.py:266-274 shape)
    "a8_pattern_count" -> ((s, d) => t(s, d, "documents")
      .groupBy(col("lang"))
      .agg(sum(size(regexp_extract_all(col("text"), lit("scan|join"), lit(0))))
        .cast("long").as("n_matches"))
      .orderBy(col("lang"))),

    // rollup (§2.4 built-in coverage)
    "a10_rollup" -> ((s, d) => t(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"))
      .orderBy(col("rf"), col("ls"))),

    // multi count-distinct (A1 family)
    "a11_distinct" -> ((s, d) => t(s, d, "lineitem")
      .agg(countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_suppkey")).as("supps"),
        countDistinct(col("l_orderkey")).as("orders"))),

    // custom typed Aggregator via udaf (§2.9): product(), absent from Spark
    "a13_product_agg" -> ((s, d) => {
      val product = udaf(graft.functions.ProductAgg)
      t(s, d, "lineitem").where(col("l_orderkey") <= 100)
        .groupBy(col("l_returnflag"))
        .agg(round(product(lit(1.0) + col("l_discount")), 6).as("disc_product"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // salt-then-merge two-phase aggregation (§4.2 skew pattern, verifiable:
    // result is identical to the plain groupBy the oracle runs)
    "a14_salted_groupby" -> ((s, d) => {
      val salted = t(s, d, "lineitem")
        .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(count(lit(1)).as("c"), sum(col("l_quantity")).as("q"))
      salted.groupBy(col("l_returnflag"))
        .agg(sum(col("c")).as("n"), round(sum(col("q")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // grouping sets via the SQL surface (§2.4 built-in coverage)
    "a15_grouping_sets" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""SELECT coalesce(o_orderstatus, 'ALL') AS st,
              | coalesce(o_orderpriority, 'ALL') AS pr, count(*) AS n
              |FROM orders_gs
              |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              |ORDER BY st, pr""".stripMargin)
    }),

    // cube (§2.4 built-in coverage)
    "a12_cube" -> ((s, d) => t(s, d, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pr"), col("n"))
      .orderBy(col("st"), col("pr"))),

    // ------------------------------------------------------ windows (§2.5)
    // W1: top-k per group (extract.py:279-283)
    "w1_topk_docs" -> ((s, d) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id").asc)
      t(s, d, "documents").withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 10)
        .select(col("lang"), col("doc_id"), col("n_chars"), col("rank"))
        .orderBy(col("lang"), col("rank"))
    }),

    // W3: running average (ocr.py:220-222 blend, done properly)
    "w3_running_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // exact: accumulate integer cents, divide once — running fp sums are
      // not reproducible across engines
      val cents = round(col("value") * 100, 0).cast("long")
      val q = sum(cents).over(w).cast("double") / (count(lit(1)).over(w) * 100)
      // floor-based half-up rounding: identical IEEE ops in both engines
      // (Spark's round() rounds the shortest-decimal repr, DuckDB the binary
      // value — they disagree on exact .xx5 quotients)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          (floor(q * 100 + 0.5) / 100).as("run_avg"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // lag/lead: inter-event gaps in ms
    "w4_session_gaps" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          coalesce(unix_millis(col("ts").cast("timestamp")) -
            lag(unix_millis(col("ts").cast("timestamp")), 1).over(w), lit(-1L))
            .as("gap_ms"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // rank per group
    "w5_rank_customers" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer").withColumn("rnk", rank().over(w).cast("long"))
        .where(col("rnk") <= 5)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"), col("rnk"))
        .orderBy(col("c_nationkey"), col("rnk"))
    }),

    // ------------------------------------------------- sorts/limits (§2.6)
    "o1_top_docs" -> ((s, d) => t(s, d, "documents")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("n_chars").desc, col("doc_id")).limit(50)),

    // ------------------------------------------------------ set ops (§2.7)
    // parts never shipped in the final year
    "set_except_parts" -> ((s, d) => t(s, d, "part").select(col("p_partkey"))
      .except(t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("l_partkey")))
      .orderBy(col("p_partkey")).limit(200)),

    "set_intersect_custkeys" -> ((s, d) => t(s, d, "customer").select(col("c_custkey"))
      .intersect(t(s, d, "orders").select(col("o_custkey")))
      .agg(count(lit(1)).as("n"))),

    "set_union_ids" -> ((s, d) => t(s, d, "customer").select(col("c_custkey").as("id"))
      .union(t(s, d, "orders").select(col("o_custkey").as("id")))
      .distinct().agg(count(lit(1)).as("n"))),

    // ----------------------------------------------- scalar funcs (§2.8)
    // F2: lower/trim normalization
    "f2_normalize_distinct" -> ((s, d) => t(s, d, "customer")
      .select(lower(trim(col("c_mktsegment"))).as("seg")).distinct().orderBy(col("seg"))),

    // F8: regex group extraction (mail.py:186-209 shape)
    "f8_regex_extract_groups" -> ((s, d) => t(s, d, "events")
      .select(regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("k_str"))
      .groupBy(col("k_str")).agg(count(lit(1)).as("n")).orderBy(col("k_str"))),

    // F9: date parts + arithmetic (campaign.py:235-239)
    "f9_date_buckets" -> ((s, d) => t(s, d, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("yr"), col("mo"))),

    // F10: staggered send schedule, deterministic analog (campaign.py:181-215)
    // — evenly spread over a 72h window from a fixed epoch, ±30min jitter
    // from a hash of the key (no RNG), sends landing in the 02:00-06:00
    // quiet window pushed +4h (campaign.py:199-208).
    "f10_stagger_schedule" -> ((s, d) => {
      val n = 100
      val base = t(s, d, "orders").orderBy(col("o_orderkey")).limit(n)
        .withColumn("rn", row_number().over(Window.orderBy(col("o_orderkey"))).cast("long") - 1)
      val spreadSec = (col("rn") * lit(72L * 3600)) / lit(n)
      val jitterSec = pmod(col("o_orderkey") * lit(2654435761L), lit(3601L)) - lit(1800L)
      val t0 = to_timestamp(lit("2026-01-01 00:00:00"))
      val sec = unix_timestamp(t0) + spreadSec.cast("long") + jitterSec
      val hr = hour(timestamp_seconds(sec))
      base.select(col("o_orderkey"),
        when(hr >= 2 && hr < 6, sec + lit(4L * 3600)).otherwise(sec)
          .as("send_at_sec")) // epoch seconds: timezone-free across engines
        .orderBy(col("o_orderkey"))
    }),

    // F13: page estimation + gateway cost math (fax.py:141-161, mail.py:138-168)
    "f13_page_cost" -> ((s, d) => {
      val pages = (col("n_chars") / lit(3000)).cast("long") + 1
      t(s, d, "documents").select(
        col("doc_id"), pages.as("pages"),
        round(pages * lit(0.07), 2).as("fax_cost"),
        round(lit(0.63) + pages * lit(0.15), 2).as("mail_cost"))
        .orderBy(col("doc_id"))
    }),

    // F12: MIME inference map (ingest.py:62-63)
    "f12_mime_infer" -> ((s, d) => t(s, d, "documents")
      .select(when(col("source") === "src0", "application/pdf")
        .when(col("source") === "src1", "text/html")
        .when(col("source") === "src2", "text/plain")
        .otherwise("application/octet-stream").as("mime"))
      .groupBy(col("mime")).agg(count(lit(1)).as("n")).orderBy(col("mime"))),

    // F15: JSON extraction (config.py:155-165 shape)
    "f15_json_extract" -> ((s, d) => t(s, d, "events")
      .groupBy(col("event_type"))
      // avg of integers = quantized ratio → floor half-up
      .agg((floor(avg(get_json_object(col("props"), "$.k").cast("long")) * 1e4 + 0.5) / 1e4)
        .as("avg_k"))
      .orderBy(col("event_type"))),

    // ------------------------------------------------ SQL surface (spark.sql)
    // the same engine through spark.sql over registered views
    "sql_top_suppliers" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_v")
      t(s, d, "supplier").createOrReplaceTempView("supplier_v")
      s.sql("""SELECT s_suppkey, s_name,
              | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
              |FROM lineitem_v JOIN supplier_v ON l_suppkey = s_suppkey
              |GROUP BY s_suppkey, s_name
              |ORDER BY revenue DESC, s_suppkey LIMIT 10""".stripMargin)
    }),

    // native Catalyst expression (codegen'd) through the SQL surface —
    // SURVEY §2.9 extension ladder; equivalence proven in FunctionsSpec
    "cf_native_fnv" -> ((s, d) => {
      graft.functions.Fnv1a64Expr.register(s)
      t(s, d, "documents").createOrReplaceTempView("documents_v")
      s.sql("""SELECT pmod(fnv1a64(text), 16) AS bucket, count(*) AS n
              |FROM documents_v GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // ------------------------------------- training-data ops: dedup family
    "dd_exact_summary" -> ((s, d) => TrainingOps.dedupExactSummary(t(s, d, "documents"))),
    "dd_exact_survivors" -> ((s, d) =>
      TrainingOps.dedupExactSurvivors(t(s, d, "documents")).orderBy(col("doc_id"))),

    // deterministic content-hash train/val/test split (dup-leakage-safe)
    "ta_split_counts" -> ((s, d) => TrainingOps.splitAssign(s, t(s, d, "documents"))
      .groupBy(col("split")).agg(count(lit(1)).as("n")).orderBy(col("split"))),

    // deterministic source-weighted corpus mixing (content-hash keep
    // decision: reproducible, dup-consistent across strata, zero shuffle)
    "ta_stratified_sample" -> ((s, d) => TrainingOps.stratifiedSample(
        s, t(s, d, "documents"),
        Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.25), defaultWeight = 0.1)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .orderBy(col("source"))),
    "dd_minhash_pairs" -> ((s, d) => TrainingOps.minhashPairs(s, t(s, d, "documents"), minSim = 0.05)
      .orderBy(col("doc_a"), col("doc_b"))),

    // the production (100 TB) minhash path END TO END: signatures written
    // ONCE through TableIO, pair generation over the STORED table — no
    // per-join-side recompute of the signature stage. Same oracle as
    // dd_minhash_pairs (the result is identical by construction; OpsSpec
    // pins it, and this makes the driver's hash gate pin it too). Fixed
    // warehouse location (no RNG/tempdir — engine-path determinism); the
    // write is marker-gated (Materialize.onceAt) so explain-only consumers
    // (tools/Plans) and repeated bench reps don't re-run the signature job
    // at every DataFrame construction — round-4 ADVICE #1.
    "dd_minhash_stored" -> ((s, d) => {
      val loc = graft.core.Materialize.warehousePath(s, "graft_minhash_sigs")
      graft.core.Materialize.onceAt(s, loc, s"minhash_sigs:k64:$d") {
        graft.core.TableIO.write(
          TrainingOps.minhashSignatures(s, t(s, d, "documents")), loc.toString)
      }
      TrainingOps.minhashPairsFromSignatures(
        s, graft.core.TableIO.read(s, loc.toString), minSim = 0.05)
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    // incremental near-dup (T41): the daily-ingest posture — the batch
    // (doc_id % 10 == 0) is shingled fresh and joined against the SAME
    // marker-materialized signature store as dd_minhash_stored, filtered
    // to the store ids (a signature depends only on its own text, so the
    // slice of the corpus store IS the store-only signature table); the
    // bucket join is cross-set (new ⋈ store), never store×store
    "dd_incremental_pairs" -> ((s, d) => {
      val loc = graft.core.Materialize.warehousePath(s, "graft_minhash_sigs")
      graft.core.Materialize.onceAt(s, loc, s"minhash_sigs:k64:$d") {
        graft.core.TableIO.write(
          TrainingOps.minhashSignatures(s, t(s, d, "documents")), loc.toString)
      }
      val newDocs = t(s, d, "documents").where(pmod(col("doc_id"), lit(10)) === 0)
      val store = graft.core.TableIO.read(s, loc.toString)
        .where(pmod(col("doc_id"), lit(10)) =!= 0)
      TrainingOps.minhashPairsAgainstStore(s,
          TrainingOps.minhashSignatures(s, newDocs).localCheckpoint(true),
          store, minSim = 0.05)
        .orderBy(col("doc_new"), col("doc_store"))
    }),
    // admission face: new-batch docs with no near-dup in the store
    "dd_incremental_admit" -> ((s, d) => {
      val loc = graft.core.Materialize.warehousePath(s, "graft_minhash_sigs")
      graft.core.Materialize.onceAt(s, loc, s"minhash_sigs:k64:$d") {
        graft.core.TableIO.write(
          TrainingOps.minhashSignatures(s, t(s, d, "documents")), loc.toString)
      }
      TrainingOps.incrementalAdmit(s,
          t(s, d, "documents").where(pmod(col("doc_id"), lit(10)) === 0),
          graft.core.TableIO.read(s, loc.toString)
            .where(pmod(col("doc_id"), lit(10)) =!= 0),
          minSim = 0.05)
        .orderBy(col("doc_id"))
    }),
    "dd_simhash_pairs" -> ((s, d) => TrainingOps.simhashPairs(s, t(s, d, "documents"), maxHamming = 8)
      .orderBy(col("doc_a"), col("doc_b"))),

    // the simhash family's stored path (completes the trio with
    // dd_minhash_stored / dd_ngram_stored): fingerprint table written once
    // (marker-gated), banded pair generation over the store; shares
    // dd_simhash_pairs' oracle by construction
    "dd_simhash_stored" -> ((s, d) => {
      val loc = graft.core.Materialize.warehousePath(s, "graft_simhash_fps")
      graft.core.Materialize.onceAt(s, loc, s"simhash_fps:$d") {
        graft.core.TableIO.write(
          TrainingOps.simhashFingerprints(s, t(s, d, "documents")), loc.toString)
      }
      TrainingOps.simhashPairsFromFingerprints(
        s, graft.core.TableIO.read(s, loc.toString), maxHamming = 8)
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    "dd_ngram_jaccard" -> ((s, d) => TrainingOps.ngramJaccardPairs(s, t(s, d, "documents"), minJaccard = 0.02)
      .orderBy(col("doc_a"), col("doc_b"))),
    // asymmetric containment (T52, Broder 1997): the quote/subset
    // detector — a small doc embedded in a big one has tiny Jaccard but
    // containment ~1.0; shares the same posting-list pair base
    "dd_ngram_containment" -> ((s, d) =>
      TrainingOps.ngramContainmentPairs(s, t(s, d, "documents"), minContainment = 0.5)
        .orderBy(col("doc_a"), col("doc_b"))),

    // the n-gram family's stored path (mirrors dd_minhash_stored): shingle
    // table written once through TableIO (marker-gated), pair generation
    // over the store — the lazy plan references the shingle stage up to 4×
    // (df probe, join-back, sizes, posting lists); the stored path scans
    // parquet instead. Same oracle as dd_ngram_jaccard by construction.
    "dd_ngram_stored" -> ((s, d) => {
      val loc = graft.core.Materialize.warehousePath(s, "graft_ngram_shingles")
      graft.core.Materialize.onceAt(s, loc, s"ngram_shingles:n3:$d") {
        graft.core.TableIO.write(
          TrainingOps.ngramShingles(s, t(s, d, "documents")), loc.toString)
      }
      TrainingOps.ngramJaccardFromShingles(
        s, graft.core.TableIO.read(s, loc.toString), minJaccard = 0.02)
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    // pairs → DECISIONS: connected components over the n-gram-Jaccard pair
    // graph (hooked min-label + pointer jump, fixpoint-checked) — the
    // cluster-membership table a dedup pipeline drops against (component =
    // min doc id = the survivor). Production shape: pair generation reads
    // the SAME marker-gated shingle store dd_ngram_stored materializes
    // (shingle once, serve pairs AND clusters); `nearDupComponents` is the
    // one-call lazy composition of the identical semantics (OpsSpec pins
    // it). Oracled via a recursive-CTE label closure over the same pair SQL.
    // NB construction RUNS the CC iteration (fixpoint needs actions — same
    // contract as sim_ann_ivf's Lloyd step); the returned plan is a scan of
    // the converged label checkpoint, so explain-only consumers pay the
    // iteration, not a re-run per downstream action.
    "dd_neardup_clusters" -> ((s, d) => {
      val loc = graft.core.Materialize.warehousePath(s, "graft_ngram_shingles")
      graft.core.Materialize.onceAt(s, loc, s"ngram_shingles:n3:$d") {
        graft.core.TableIO.write(
          TrainingOps.ngramShingles(s, t(s, d, "documents")), loc.toString)
      }
      TrainingOps.connectedComponents(s,
          TrainingOps.ngramJaccardFromShingles(
            s, graft.core.TableIO.read(s, loc.toString), minJaccard = 0.5)
            .select(col("doc_a"), col("doc_b")))
        .select(col("node").as("doc_id"), col("comp").as("component"))
        .orderBy(col("doc_id"))
    }),
    // leakage-free split (T40): every near-dup component co-splits via its
    // canonical member's content hash (pairs from the SAME marker-gated
    // shingle store as dd_neardup_clusters); singletons = splitAssign
    "ta_cluster_split" -> ((s, d) => {
      val loc = graft.core.Materialize.warehousePath(s, "graft_ngram_shingles")
      graft.core.Materialize.onceAt(s, loc, s"ngram_shingles:n3:$d") {
        graft.core.TableIO.write(
          TrainingOps.ngramShingles(s, t(s, d, "documents")), loc.toString)
      }
      TrainingOps.clusterSplit(s, t(s, d, "documents"),
          TrainingOps.ngramJaccardFromShingles(
            s, graft.core.TableIO.read(s, loc.toString), minJaccard = 0.5)
            .select(col("doc_a"), col("doc_b")))
        .orderBy(col("doc_id"))
    }),
    "dd_embed_cosine" -> ((s, d) => TrainingOps.embedCosinePairs(s, t(s, d, "embeddings"), minSim = 0.4)
      .orderBy(col("vec_a"), col("vec_b"))),
    "dd_embed_lsh" -> ((s, d) => TrainingOps.embedCosinePairsLsh(s, t(s, d, "embeddings"), minSim = 0.4)
      .orderBy(col("vec_a"), col("vec_b"))),
    // SemDeDup (T37): pairs compared only within a Lloyd k-means cell —
    // the pair cost bends from n² to Σ cell² ≈ n²/nCells; the oracle
    // replays the exact fixed-point k-means (sim_ann_ivf's CTEs) plus the
    // within-cell pair join
    "dd_semantic_pairs" -> ((s, d) => TrainingOps.semanticDupPairs(s, t(s, d, "embeddings"), minSim = 0.4)
      .orderBy(col("vec_a"), col("vec_b"))),
    // SemDeDup keep-one resolution: the semantic pair graph through the
    // same hooked-min CC that resolves every pair family (component = min
    // vec_id = the survivor); oracle = k-means CTEs + recursive closure
    "dd_semantic_clusters" -> ((s, d) =>
      TrainingOps.connectedComponents(s,
          TrainingOps.semanticDupPairs(s, t(s, d, "embeddings"), minSim = 0.4)
            .select(col("vec_a"), col("vec_b")))
        .select(col("node").as("vec_id"), col("comp").as("component"))
        .orderBy(col("vec_id"))),

    // ------------------------------------------- similarity search (ANN)
    "sim_cosine_topk" -> ((s, d) => TrainingOps.cosineTopK(s, t(s, d, "embeddings"))
      .orderBy(col("query_id"), col("rank"))),
    "sim_ann_lsh" -> ((s, d) => TrainingOps.annLshTopK(s, t(s, d, "embeddings"))
      .orderBy(col("query_id"), col("rank"))),
    "sim_ann_ivf" -> ((s, d) => TrainingOps.annIvfTopK(s, t(s, d, "embeddings"))
      .orderBy(col("query_id"), col("rank"))),

    // ----------------------------------------- multimodal columns (binary)
    "mm_meta_summary" -> ((s, d) =>
      MediaOps.metaSummary(s, MediaOps.mediaTable(t(s, d, "documents")))
        .orderBy(col("kind"))),
    "mm_frame_stats" -> ((s, d) =>
      MediaOps.frameSample(s, MediaOps.mediaTable(t(s, d, "documents")))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"), max(col("frame_ms")).as("last_frame_ms"))
        .orderBy(col("media_id"))),
    "mm_resize_plan" -> ((s, d) =>
      MediaOps.resizePlan(s, MediaOps.mediaTable(t(s, d, "documents")))
        .orderBy(col("media_id"))),
    "mm_feature_ann" -> ((s, d) => TrainingOps.cosineTopK(s,
      MediaOps.featureExtract(s, MediaOps.mediaTable(t(s, d, "documents")))
        .withColumnRenamed("media_id", "vec_id"))
      .orderBy(col("query_id"), col("rank"))),

    // -------------------------- entity linking (J2/F7, extract.py:296-377)
    // oracled since round 5: DuckDB replays the linking algebra (exact tier,
    // LIKE-containment tier, cluster min) over the materialized extraction
    // spans. The queries READ that same store (production shape: extract
    // once, link many — a lazy plan re-ran the 300-doc kernel once per
    // mention-table reference, up to 4× inside linkStats).
    "j4_entity_link" -> ((s, _) => EntityLink.linkStatsFrom(s,
      EntityLink.mentionsFromStore(graft.core.TableIO.read(s, extractSpansStore(s))))
      .orderBy(col("entity_type"))),

    // alias sets + confidence bucketing per canonical (extract.py:363-377
    // export carries aliases; models.py:95-99 ConfidenceLevel) — scalar face
    "j7_entity_aliases" -> ((s, _) => EntityLink.aliasStatsFrom(s,
      EntityLink.mentionsFromStore(graft.core.TableIO.read(s, extractSpansStore(s))))
      .orderBy(col("entity_type"), col("confidence_level"))),

    // relationship analog: entity co-occurrence graph (extract.py:99-103,
    // entity_links models.py:114-122) — same-doc canonical pairs
    "j6_cooccurrence" -> ((s, _) => EntityLink.cooccurrenceFrom(
        EntityLink.mentionsFromStore(graft.core.TableIO.read(s, extractSpansStore(s))),
        minDocs = 2)
      .orderBy(col("n_docs").desc, col("type_a"), col("norm_a"),
        col("type_b"), col("norm_b"))
      .limit(100)),

    // J3: verification join — kernel output vs independent golden oracle.
    // Since round 6 it compares the two materialized scalar span stores
    // (every span field dumped), which puts the comparison itself on the
    // DuckDB oracle surface (VERDICT r5 #4): a doc mismatches iff its
    // scalar row set differs between the stores — exactly the old
    // struct-sequence full-outer equality, because (seq, kind, text,
    // media_ref, offset) rows determine the span sequence. The golden
    // IMPLEMENTATION stays independent (regex-engine, graft.golden); only
    // its output is dumped. The in-suite golden gate (KernelGoldenSpec,
    // 8k-doc sweep) is unchanged and remains the primary parity guard.
    // r8 shape: ONE null-safe full-outer join of per-row multiset counts
    // replaces the two exceptAll subtrees (each of which shuffled both
    // stores) plus the separate doc-id union — a doc mismatches iff some
    // row's per-side multiplicities differ, which is exactly exceptAll
    // nonempty in either direction (guide §2.4: fewer passes, fewer
    // exchanges). <=> keys because posexplode_outer emits null span
    // fields for empty docs and exceptAll compares nulls equal.
    "j5_golden_compare" -> ((s, _) => {
      val k = graft.core.TableIO.read(s, extractSpansStore(s))
      val g = graft.core.TableIO.read(s, goldenSpansStore(s))
      val cols = k.columns.toSeq
      val ka = k.groupBy(cols.map(col): _*).agg(count(lit(1)).as("ck")).as("ka")
      val gb = g.groupBy(cols.map(col): _*).agg(count(lit(1)).as("cg")).as("gb")
      val cond = cols.map(c => col(s"ka.$c") <=> col(s"gb.$c")).reduce(_ && _)
      ka.join(gb, cond, "full")
        .select(coalesce(col("ka.doc_id"), col("gb.doc_id")).as("doc_id"),
          (coalesce(col("ck"), lit(0L)) =!= coalesce(col("cg"), lit(0L)))
            .cast("long").as("mm"))
        .groupBy(col("doc_id")).agg(max(col("mm")).as("mm"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("mm")), lit(0L)).as("n_mismatches"))
    }),

    // ---------------------------------- chunker (F6, extract.py:215-237)
    // oracled since round 5: DuckDB rebuilds each doc's "\n\n"-joined text
    // from the materialized spans and replays the greedy pack as the same
    // list_reduce fold f6_chunker_docs validated
    "f6_chunker" -> ((s, _) => {
      extractSpansStore(s)
      import s.implicits._
      s.range(0L, 300L).map { i =>
        val doc = Extractor.extractDoc(SpanGen.genDoc(SpanGen.docId(i)))
        val text = doc.spans.filter(_.kind == "text").map(_.text).mkString("\n\n")
        val chunks = Chunker.chunk(text, maxChars = 400)
        (doc.doc_id, chunks.length.toLong,
          if (chunks.isEmpty) 0L else chunks.map(_.length).max.toLong)
      }.toDF("doc_id", "n_chunks", "max_chunk_chars").orderBy(col("doc_id"))
    }),

    // chunker over TABLE text (F6's oracle-expressible face — f6_chunker
    // above exercises the same Chunker on kernel output, which DuckDB
    // cannot recompute): paragraphs synthesized deterministically (7-word
    // groups joined "\n\n"), then the reference-exact greedy pack at an
    // 80-char cap; the oracle replays the fold as a DuckDB list_reduce over
    // integer lengths — exact in both engines
    "f6_chunker_docs" -> ((s, d) => {
      import s.implicits._
      graft.queries.AdaptiveShuffle.spread(
          t(s, d, "documents").select(col("doc_id").cast("long"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val ws = text.split("\\s+").filter(_.nonEmpty)
          val paras = ws.grouped(7).map(_.mkString(" ")).toVector
          val chunks = Chunker.chunk(paras.mkString("\n\n"), maxChars = 80)
          (id, chunks.length.toLong,
            if (chunks.isEmpty) 0L else chunks.map(_.length).max.toLong)
        }.toDF("doc_id", "n_chunks", "max_chunk_chars")
        .orderBy(col("doc_id"))
    }),

    // ------------------------------------------------- text analysis ops
    "ta_token_counts" -> ((s, d) =>
      TrainingOps.tokenCounts(t(s, d, "documents")).orderBy(col("doc_id"))),
    "ta_quality_score" -> ((s, d) =>
      TrainingOps.qualityScore(t(s, d, "documents")).orderBy(col("doc_id"))),
    "ta_lang_id" -> ((s, d) =>
      TrainingOps.langId(t(s, d, "documents")).orderBy(col("doc_id"))),
    "ta_fingerprints" -> ((s, d) =>
      TrainingOps.fingerprints(s, t(s, d, "documents")).orderBy(col("doc_id"), col("idx"))),
    // Gopher-style intra-doc repetition filter (Rae et al. 2021 §A1.1)
    "ta_repetition" -> ((s, d) =>
      TrainingOps.repetitionStats(s, t(s, d, "documents")).orderBy(col("doc_id"))),
    // train/eval n-gram contamination check (eval = doc_id % 20 == 0 slice)
    // hashGrams: 8-byte FNV gram hashes shuffle instead of ~50 B strings
    // (r8 switch — the engine's documented scale form; result-identical,
    // OpsSpec pins hashed/string parity, oracle replays the string form)
    "ta_contamination" -> ((s, d) =>
      TrainingOps.contaminationCheck(s, t(s, d, "documents"), hashGrams = true)
        .orderBy(col("doc_id"))),

    // the contamination family's stored path (completes the quartet with
    // dd_{minhash,simhash,ngram}_stored): the DISTINCT train-gram table is
    // written once through TableIO (marker-gated) and every eval set joins
    // against the store — at 100 TB the train corpus shingles once per
    // snapshot, not once per benchmark sweep. Shares ta_contamination's
    // oracle (identical result by construction; OpsSpec pins it).
    "ta_contamination_stored" -> ((s, d) => {
      // hashed-gram store since r8 (tag bumped so a string-gram store from
      // an earlier round rebuilds): the stored artifact is the scale form —
      // 8 bytes/gram on disk and through every eval-side join
      val loc = graft.core.Materialize.warehousePath(s, "graft_train_grams")
      graft.core.Materialize.onceAt(s, loc, s"train_grams:n8:m20:h:$d") {
        graft.core.TableIO.write(
          TrainingOps.contaminationTrainGrams(s, t(s, d, "documents"),
            hashGrams = true), loc.toString)
      }
      TrainingOps.contaminationFromTrainGrams(s, t(s, d, "documents"),
        graft.core.TableIO.read(s, loc.toString), hashGrams = true)
        .orderBy(col("doc_id"))
    }),
    // exact top-k token frequencies (TakeOrderedAndProject — k rows ever
    // collected; tie-break token ASC for engine-deterministic boundaries)
    // k=20 < the corpus vocabulary, so the limit genuinely truncates and
    // the rank-k boundary (count ties broken token-asc) is exercised
    "ta_vocab_topk" -> ((s, d) => TrainingOps.vocabTopK(t(s, d, "documents"), k = 20)),
    // CCNet-style unigram-LM scoring (nats/token against the corpus's own
    // unigram distribution; flag = rare-token-heavy docs)
    "ta_perplexity" -> ((s, d) =>
      TrainingOps.unigramLogProb(t(s, d, "documents")).orderBy(col("doc_id"))),
    // held-out-LM mode (the actual CCNet posture): the unigram vocab is
    // built from the TRAIN slice only (doc_id % 20 != 0), materialized
    // once through TableIO (marker-gated — the stored-LM artifact), and
    // the eval slice is scored against the store; OOV tokens score at the
    // Laplace floor (count 1). Completes the stored-table quintet with
    // dd_{minhash,simhash,ngram}_stored + ta_contamination_stored.
    "ta_perplexity_heldout" -> ((s, d) => {
      val loc = graft.core.Materialize.warehousePath(s, "graft_unigram_vocab")
      graft.core.Materialize.onceAt(s, loc, s"unigram_vocab:m20:$d") {
        graft.core.TableIO.write(
          TrainingOps.unigramVocab(t(s, d, "documents")
            .where(pmod(col("doc_id").cast("long"), lit(20)) =!= 0)), loc.toString)
      }
      TrainingOps.unigramLogProbFromVocab(s,
          t(s, d, "documents")
            .where(pmod(col("doc_id").cast("long"), lit(20)) === 0),
          graft.core.TableIO.read(s, loc.toString))
        .orderBy(col("doc_id"))
    }),
    // greedy sample packing into 512-token context windows, 64 shards
    "ta_seq_pack" -> ((s, d) =>
      TrainingOps.sequencePack(s, t(s, d, "documents")).orderBy(col("doc_id"))),
    // contamination with a broadcast Bloom pre-filter on the eval grams —
    // result-identical to ta_contamination (shares its oracle); the exact
    // join input shrinks to true overlaps + fpp false positives
    "ta_contamination_bloom" -> ((s, d) =>
      TrainingOps.contaminationCheckBloom(s, t(s, d, "documents")).orderBy(col("doc_id"))),
    // temperature-scaled source mixing weights (τ=0.5 upweights rare sources)
    "ta_mix_weights" -> ((s, d) =>
      TrainingOps.sourceMixWeights(t(s, d, "documents")).orderBy(col("source"))),
    // per-source quality calibration: type-1 discrete percentiles of the
    // stopword ratio (integer ranks — exact cross-engine, no interpolation)
    "ta_quality_calibration" -> ((s, d) =>
      TrainingOps.qualityCalibration(t(s, d, "documents")).orderBy(col("source"))),
    // token-budget corpus selection (T38): fill each source's 800-token
    // slot best-quality-first — two-phase distributed prefix sum (group
    // subtotals + broadcast group prefix; no per-source sort partition),
    // bit-equal to the naive single-window form the oracle replays
    "ta_budget_select" -> ((s, d) =>
      TrainingOps.budgetSelect(t(s, d, "documents"), budgetTokens = 800)
        .orderBy(col("doc_id"))),
    // deterministic per-epoch training order (hash-bucketed reshuffle,
    // shard-local rank — no global sort)
    "ta_epoch_shuffle" -> ((s, d) => TrainingOps.epochShuffle(s, t(s, d, "documents"))
      .orderBy(col("epoch"), col("shard"), col("ord"))),
    // cross-doc exact substring dedup (Lee et al. 2022): per-doc duplicated
    // token mass from ≥2-doc n-token windows, min-doc_id canonical copy
    // exempt; flag is an exact integer ≥20% comparison
    // hashWindows: the engine shuffles 8-byte FNV window hashes instead of
    // ~50 B window strings (the contamination hashGrams doctrine — r8
    // switch, result-identical, OpsSpec pins face parity); the oracle
    // replays the string form, so the hash gate pins it cross-engine too
    "dd_substring_stats" -> ((s, d) =>
      TrainingOps.substringDupStats(s, t(s, d, "documents"), hashWindows = true)
        .orderBy(col("doc_id"))),
    // the removal face (T43): rewritten corpus with non-canonical
    // duplicated-window tokens deleted (Lee et al. 2022's actual edit)
    "dd_substring_rewrite" -> ((s, d) =>
      TrainingOps.substringRewrite(s, t(s, d, "documents"), hashWindows = true)
        .orderBy(col("doc_id"))),
    // trained NB classifier (T42, fastText posture): hashed-unigram
    // naive Bayes fit on the pmod!=0 split over the lang labels, argmax
    // class per doc, holdout slice = honest accuracy readout
    "ta_nb_classify" -> ((s, d) =>
      TrainingOps.nbClassify(s, t(s, d, "documents")).orderBy(col("doc_id"))),
    // confidence-AUC (T51, Mann-Whitney/Hand & Till): does the NB score
    // rank correct holdout predictions above mistakes? Integer rank-sum
    // via the T38 two-phase prefix — 1-row output, exact ratio 6dp
    "ta_confidence_auc" -> ((s, d) =>
      TrainingOps.confidenceAuc(s, t(s, d, "documents"))),
    // bigram LM with Stupid Backoff (T44, Brants et al. 2007): count
    // tables fit on the pmod!=0 split, per-doc avg ln-score + bigram hit
    // rate — the context-aware upgrade of the unigram perplexity faces
    "ta_bigram_lm" -> ((s, d) =>
      TrainingOps.bigramStupidBackoff(s, t(s, d, "documents")).orderBy(col("doc_id"))),
    // DSIR importance weights (Xie et al. 2023): hashed-unigram log
    // likelihood ratio vs the src0 slice as the target distribution
    "ta_dsir_weights" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TrainingOps.dsirWeights(s, docs, docs.where(col("source") === "src0"))
        .orderBy(col("doc_id"))
    }),
    // per-source distribution drift vs the corpus mixture (T47): KL and
    // Jensen-Shannon over the DSIR hashed-unigram feature model — the
    // telemetry face that gates re-fitting the mixture/classifier models
    "ta_source_divergence" -> ((s, d) =>
      TrainingOps.sourceDivergence(s, t(s, d, "documents"))
        .orderBy(col("source"))),
    // BM25 ranked retrieval (T45, Robertson et al. 1994): mixed-df query
    // ('dup' is rare, the others common); top-k is semantic
    // (TakeOrderedAndProject) with ties broken on the quantized score
    "ret_bm25_topk" -> ((s, d) =>
      RetrievalOps.bm25TopK(t(s, d, "documents"), Seq("dup", "spark", "window"))),
    // PageRank over the entity co-occurrence graph (T46, Page et al.
    // 1999): symmetric co-mention edges with support >= 2 docs (the j6
    // co_mentioned posture — single-doc co-mention is noise, and on this
    // store it is 110× the edge volume and 2,600× the wedge volume of
    // the supported graph), exact integer arithmetic — no fp caveat
    "gr_pagerank" -> ((s, _) =>
      GraphOps.pageRank(s, coMentionEdges(s))
        .orderBy(col("rank_units").desc, col("node"))),
    // weight-proportional PageRank (T53): out-mass splits by co-mention
    // support n_docs — strength-aware centrality, bit-identical to
    // gr_pagerank when all weights are equal (OpsSpec pins that)
    "gr_pagerank_weighted" -> ((s, _) =>
      GraphOps.pageRankWeighted(s, coMentionWeightedEdges(s))
        .orderBy(col("rank_units").desc, col("node"))),
    // personalized PageRank (T49): teleport mass restricted to PERSON
    // nodes — entity importance as seen from the corpus's people
    "gr_pagerank_seeded" -> ((s, _) =>
      GraphOps.pageRankSeeded(s, coMentionEdges(s),
          col("node").startsWith("PERSON:"))
        .orderBy(col("rank_units").desc, col("node"))),
    // triangle statistics (T50, Suri & Vassilvitskii 2011): per-node
    // degree + triangle counts via the degree-ordered node-iterator —
    // wedge volume bounded E^1.5 on ANY graph, all-integer output
    "gr_triangles" -> ((s, _) =>
      GraphOps.triangleStats(s, coMentionEdges(s))
        .orderBy(col("triangles").desc, col("node"))),
    // corpus snapshot diff (T48): two deterministic versions synthesized
    // from the documents table (v1 drops doc_id%7==0, v2 drops %5==0 and
    // appends ' v2' to %3==0 texts) — added/removed/changed/unchanged per
    // doc via the 16-byte hash face; the oracle compares text directly
    "ta_snapshot_diff" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val vOld = docs.where(pmod(col("doc_id").cast("long"), lit(7L)) =!= 0)
      val vNew = docs.where(pmod(col("doc_id").cast("long"), lit(5L)) =!= 0)
        .withColumn("text",
          when(pmod(col("doc_id").cast("long"), lit(3L)) === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
      TrainingOps.snapshotDiff(s, vOld, vNew).orderBy(col("doc_id"))
    }),
    // tokenizer training faces (Sennrich et al. 2016): first-iteration BPE
    // pair statistics (top-k is semantic — TakeOrderedAndProject), and the
    // 4-step greedy merge loop's merge table
    "ta_bpe_pairs" -> ((s, d) => TrainingOps.bpePairCounts(s, t(s, d, "documents"))),
    "ta_bpe_merges" -> ((s, d) => TrainingOps.bpeMerges(s, t(s, d, "documents"))
      .orderBy(col("iter"))),
    // the apply side (T39): per-doc model-token counts under the trained
    // merges — the merge fold runs once per DISTINCT word (vocab-sized),
    // joined back fan-out 1 per (doc, distinct word)
    "ta_bpe_encode" -> ((s, d) => TrainingOps.bpeEncodeCounts(s, t(s, d, "documents"))
      .orderBy(col("doc_id"))),

    // ------------------------- curation funnel (extract → filter → dedup)
    // all stage counts in ONE conditional-aggregation scan of the extraction
    // (the round-1 crossJoin-of-counts shape recomputed the pipeline 3×)
    // oracled since round 5: DuckDB rebuilds each doc's space-joined text
    // from the materialized spans and replays the quality gate + distinct
    // content hash — the whole funnel algebra, hash-compared
    "cu_curation_funnel" -> ((s, _) => {
      extractSpansStore(s)
      import s.implicits._
      val spans = s.range(0L, 300L)
        .map(i => Extractor.extractDoc(SpanGen.genDoc(SpanGen.docId(i)))).toDF()
      graft.job.CurationJob.funnelCounts(graft.job.CurationJob.docText(spans))
    }),

    // PII scrub over the reassembled extraction text (emails + phone
    // numbers masked; the corpus genuinely contains both as inline entity
    // text — spec §3 keeps entity text inside the surviving text spans).
    // Oracle replays the same string_agg reassembly + RE2-portable regexes.
    "ex_pii_scrub" -> ((s, _) => {
      extractSpansStore(s)
      import s.implicits._
      val spans = s.range(0L, 300L)
        .map(i => Extractor.extractDoc(SpanGen.genDoc(SpanGen.docId(i)))).toDF()
      TrainingOps.piiScrub(graft.job.CurationJob.docText(spans)).orderBy(col("doc_id"))
    }),

    // ------------------------------------- extraction pipeline (north rule)
    // the kernel itself is not SQL-expressible (golden-equality specs pin
    // it); since round 5 these aggregation faces ARE oracled — DuckDB
    // re-aggregates the materialized extraction spans (extractSpansStore)
    "ex_kind_histogram" -> ((s, _) => { extractSpansStore(s); entry(s) }),
    "ex_spans_per_doc" -> ((s, _) => {
      extractSpansStore(s)
      import s.implicits._
      s.range(0L, 300L).map(i => Extractor.extractDoc(SpanGen.genDoc(SpanGen.docId(i))))
        .select(col("doc_id"), size(col("spans")).cast("long").as("n_spans"))
        .orderBy(col("doc_id")).limit(100)
    }),
    "ex_entity_top" -> ((s, _) => {
      extractSpansStore(s)
      import s.implicits._
      s.range(0L, 300L).map(i => Extractor.extractDoc(SpanGen.genDoc(SpanGen.docId(i))))
        .select(explode(col("spans")).as("s"))
        .where(col("s.kind").startsWith("entity:"))
        .groupBy(col("s.kind").as("kind")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("kind")).limit(20)
    }))

  // dd_{minhash,simhash,ngram}_stored are the same computations over a
  // materialized signature/fingerprint/shingle table — each shares its
  // lazy twin's oracle verbatim (appended at the end)
  /** Shared co-mention edge build for the graph queries: canonical pairs
    * with support >= 2 documents (exactly [[EntityLink.cooccurrenceFrom]]'s
    * `co_mentioned` threshold — the single-doc co-mention noise floor is
    * 110× the edge volume on this store), symmetrized. The canonical src
    * string sorts below dst (':' sorts below every entity-type char, so
    * tuple order and concatenated-string order agree). */
  private def coMentionEdges(s: SparkSession): DataFrame = {
    val co = EntityLink.cooccurrenceFrom(
      EntityLink.mentionsFromStore(
        graft.core.TableIO.read(s, extractSpansStore(s))), minDocs = 2)
    val p = co.select(
      concat_ws(":", col("type_a"), col("norm_a")).as("src"),
      concat_ws(":", col("type_b"), col("norm_b")).as("dst"))
    p.union(p.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** [[coMentionEdges]] carrying the co-mention support as the edge
    * weight (T53's input). */
  private def coMentionWeightedEdges(s: SparkSession): DataFrame = {
    val co = EntityLink.cooccurrenceFrom(
      EntityLink.mentionsFromStore(
        graft.core.TableIO.read(s, extractSpansStore(s))), minDocs = 2)
    val p = co.select(
      concat_ws(":", col("type_a"), col("norm_a")).as("src"),
      concat_ws(":", col("type_b"), col("norm_b")).as("dst"),
      col("n_docs").as("w"))
    p.union(p.select(col("dst").as("src"), col("src").as("dst"), col("w")))
  }

  /** Generated replay of [[GraphOps.pageRankWeighted]]: the graph head
    * keeps the pair support as the edge weight, shares are per-edge
    * ⌊r·w/W⌋, rounds otherwise identical to [[pageRankSql]]. */
  private def pageRankWeightedSql(iters: Int): String = {
    val head =
      """WITH m AS (SELECT DISTINCT doc_id, substr(kind, 8) AS entity_type,
        |    lower(text) AS norm
        |  FROM read_parquet('__WAREHOUSE__/graft_extract_spans/*.parquet')
        |  WHERE kind LIKE 'entity:%'),
        |p AS (SELECT a.entity_type || ':' || a.norm AS src,
        |    b.entity_type || ':' || b.norm AS dst, CAST(count(*) AS BIGINT) AS w
        |  FROM m a JOIN m b ON a.doc_id = b.doc_id
        |    AND (a.entity_type < b.entity_type
        |      OR (a.entity_type = b.entity_type AND a.norm < b.norm))
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT src, dst, w FROM p UNION ALL SELECT dst, src, w FROM p),
        |nod AS (SELECT DISTINCT src AS node FROM e),
        |nn AS (SELECT count(*) AS n FROM nod),
        |wt AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS wt FROM e GROUP BY 1),
        |r0 AS (SELECT node, CAST(floor(1e9 / nn.n) AS BIGINT) AS r
        |  FROM nod CROSS JOIN nn)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s""",
         |c$k AS (SELECT e.dst AS node,
         |    CAST(sum(CAST(floor(CAST(r.r AS DOUBLE) * e.w / wt.wt) AS BIGINT)) AS BIGINT) AS c
         |  FROM e JOIN r${k - 1} r ON e.src = r.node JOIN wt ON e.src = wt.node GROUP BY 1),
         |r$k AS (SELECT nod.node, CAST(floor(1.5e8 / nn.n)
         |    + floor(CAST(coalesce(c.c, 0) AS DOUBLE) * CAST(85 AS DOUBLE) / CAST(100 AS DOUBLE)) AS BIGINT) AS r
         |  FROM nod CROSS JOIN nn LEFT JOIN c$k c ON nod.node = c.node)""".stripMargin
    }.mkString
    head + rounds +
      s"\nSELECT node, r AS rank_units FROM r$iters ORDER BY rank_units DESC, node"
  }

  /** Shared replay of [[coMentionEdges]]: p = canonical pairs with
    * support >= 2, e = both directions, nod = the node set. */
  private val graphSqlHead: String =
    """WITH m AS (SELECT DISTINCT doc_id, substr(kind, 8) AS entity_type,
      |    lower(text) AS norm
      |  FROM read_parquet('__WAREHOUSE__/graft_extract_spans/*.parquet')
      |  WHERE kind LIKE 'entity:%'),
      |p AS (SELECT a.entity_type || ':' || a.norm AS src,
      |    b.entity_type || ':' || b.norm AS dst
      |  FROM m a JOIN m b ON a.doc_id = b.doc_id
      |    AND (a.entity_type < b.entity_type
      |      OR (a.entity_type = b.entity_type AND a.norm < b.norm))
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
      |nod AS (SELECT DISTINCT src AS node FROM e),""".stripMargin

  /** Shared NB-classifier replay (the T42 FNV bucket ladder through the
    * argmax), ending in the `nbout` CTE (doc_id, label, pred, score,
    * correct, holdout) — consumed by `ta_nb_classify` and the T51 AUC. */
  private val nbClassifySqlCore: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok FROM documents),
      |hb AS (
      |  SELECT doc_id, ((CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
      |      THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) % 4096)
      |    + 4096) % 4096 AS b
      |  FROM (SELECT doc_id, list_reduce(
      |      list_prepend(14695981039346656037::HUGEINT,
      |        [unicode(tok[i])::HUGEINT for i in generate_series(1, length(tok))]),
      |      (a, x) -> (xor(a, x) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
      |    ) AS hu FROM toks)),
      |docb AS (SELECT doc_id, b, count(*) AS c FROM hb GROUP BY doc_id, b),
      |train AS (SELECT doc_id, lang AS label FROM documents WHERE doc_id % 5 <> 0),
      |classb AS (SELECT t.label, d.b, CAST(sum(d.c) AS BIGINT) AS n
      |  FROM docb d JOIN train t ON d.doc_id = t.doc_id GROUP BY t.label, d.b),
      |classtot AS (SELECT label, CAST(sum(n) AS BIGINT) AS nt FROM classb GROUP BY label),
      |priors AS (SELECT label, CAST(count(*) AS BIGINT) AS nd FROM train GROUP BY label),
      |ndt AS (SELECT CAST(sum(nd) AS BIGINT) AS ndt FROM priors),
      |sc AS (SELECT d.doc_id, ct.label,
      |    sum(d.c * (ln(CAST(coalesce(cb.n, 0) + 1 AS DOUBLE))
      |      - ln(CAST(ct.nt + 4096 AS DOUBLE)))) AS ll
      |  FROM docb d CROSS JOIN classtot ct
      |  LEFT JOIN classb cb ON cb.label = ct.label AND cb.b = d.b
      |  GROUP BY d.doc_id, ct.label),
      |scored AS (SELECT sc.doc_id, sc.label,
      |    floor((sc.ll + ln(CAST(p.nd AS DOUBLE) / ndt.ndt)) * 10000 + 0.5) / 10000 AS score
      |  FROM sc JOIN priors p ON sc.label = p.label, ndt),
      |pred AS (SELECT doc_id, label AS pred, score,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rn
      |  FROM scored),
      |nbout AS (SELECT d.doc_id, d.lang AS label, p.pred, p.score,
      |    (p.pred = d.lang) AS correct, (d.doc_id % 5 = 0) AS holdout
      |  FROM documents d JOIN pred p ON d.doc_id = p.doc_id AND p.rn = 1)""".stripMargin

  /** Generated replay of [[GraphOps.triangleStats]]: degree-ordered
    * orientation, wedge join over oriented out-neighbor pairs, closure
    * against the canonical pair set, per-node unnest — all exact longs. */
  private def triangleSql: String =
    graphSqlHead + """
      |deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),
      |o AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND p.src < p.dst)
      |      THEN p.src ELSE p.dst END AS u,
      |    CASE WHEN da.d < db.d OR (da.d = db.d AND p.src < p.dst)
      |      THEN p.dst ELSE p.src END AS v
      |  FROM p JOIN deg da ON p.src = da.node JOIN deg db ON p.dst = db.node),
      |w AS (SELECT e1.u AS u, e1.v AS v1, e2.v AS v2
      |  FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.v < e2.v),
      |tri AS (SELECT u, v1, v2 FROM w JOIN p ON w.v1 = p.src AND w.v2 = p.dst),
      |tn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
      |    SELECT u AS node FROM tri UNION ALL SELECT v1 FROM tri
      |    UNION ALL SELECT v2 FROM tri)
      |  GROUP BY 1)
      |SELECT n.node, CAST(d.d AS BIGINT) AS degree,
      |  coalesce(tn.triangles, 0) AS triangles
      |FROM nod n JOIN deg d ON n.node = d.node LEFT JOIN tn ON n.node = tn.node
      |ORDER BY triangles DESC, n.node""".stripMargin

  /** Generated CTE chain replaying [[GraphOps.pageRank]]'s fixed-count
    * integer iterations over the co-mention graph (same mentions/pairs
    * construction as the j6 replay): s_k = per-node floored share,
    * c_k = summed incoming shares, r_k = base + floored damped mass.
    * With `seedLike`, replays [[GraphOps.pageRankSeeded]] instead: |S|
    * counts only matching nodes and start/teleport mass is gated by the
    * same LIKE predicate. */
  private def pageRankSql(iters: Int, seedLike: Option[String] = None): String = {
    val head = graphSqlHead +
      (seedLike match {
        case None => """
          |nn AS (SELECT count(*) AS n FROM nod),
          |dg AS (SELECT src AS node, count(*) AS od FROM e GROUP BY 1),
          |r0 AS (SELECT node, CAST(floor(1e9 / nn.n) AS BIGINT) AS r
          |  FROM nod CROSS JOIN nn)""".stripMargin
        case Some(pat) => s"""
          |nn AS (SELECT count(*) AS n FROM nod WHERE node LIKE '$pat'),
          |dg AS (SELECT src AS node, count(*) AS od FROM e GROUP BY 1),
          |r0 AS (SELECT node, CASE WHEN node LIKE '$pat'
          |    THEN CAST(floor(1e9 / nn.n) AS BIGINT) ELSE 0 END AS r
          |  FROM nod CROSS JOIN nn)""".stripMargin
      })
    val baseExpr = seedLike match {
      case None => "floor(1.5e8 / nn.n)"
      case Some(pat) =>
        s"CASE WHEN nod.node LIKE '$pat' THEN floor(1.5e8 / nn.n) ELSE 0 END"
    }
    val rounds = (1 to iters).map { k =>
      s""",
         |s$k AS (SELECT r.node, CAST(floor(CAST(r.r AS DOUBLE) / d.od) AS BIGINT) AS s
         |  FROM r${k - 1} r JOIN dg d ON r.node = d.node),
         |c$k AS (SELECT e.dst AS node, CAST(sum(s.s) AS BIGINT) AS c
         |  FROM e JOIN s$k s ON e.src = s.node GROUP BY 1),
         |r$k AS (SELECT nod.node, CAST($baseExpr
         |    + floor(CAST(coalesce(c.c, 0) AS DOUBLE) * CAST(85 AS DOUBLE) / CAST(100 AS DOUBLE)) AS BIGINT) AS r
         |  FROM nod CROSS JOIN nn LEFT JOIN c$k c ON nod.node = c.node)""".stripMargin
    }.mkString
    head + rounds +
      s"\nSELECT node, r AS rank_units FROM r$iters ORDER BY rank_units DESC, node"
  }

  def oracleSql: Map[String, String] = {
    val base = baseOracleSql
    // the incremental faces share dd_minhash_pairs' signature-replay CTE
    // ladder verbatim (everything before `cand AS (`); only the pair tail
    // differs — cross-set (batch = doc_id % 10 = 0, store = rest) instead
    // of the a<b self-join
    val mhPairs = base("dd_minhash_pairs")
    val mhLadder = mhPairs.substring(0, mhPairs.indexOf("cand AS ("))
    val incCand = mhLadder +
      """cand AS (
        |  SELECT a.doc_id AS doc_new, b.doc_id AS doc_store,
        |    CAST(len(list_filter(generate_series(1, 64), p -> a.sig[p] = b.sig[p])) AS DOUBLE) / 64
        |      AS est_jaccard
        |  FROM sig a JOIN sig b ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        |  WHERE EXISTS (SELECT 1 FROM generate_series(0, 15) g(bd)
        |    WHERE a.sig[4*bd+1:4*bd+4] = b.sig[4*bd+1:4*bd+4]))""".stripMargin
    base + ("dd_minhash_stored" -> base("dd_minhash_pairs")) +
      ("dd_ngram_stored" -> base("dd_ngram_jaccard")) +
      ("dd_simhash_stored" -> base("dd_simhash_pairs")) +
      ("ta_contamination_stored" -> base("ta_contamination")) +
      ("ta_contamination_bloom" -> base("ta_contamination")) +
      ("dd_incremental_pairs" -> (incCand + """
        |SELECT doc_new, doc_store, est_jaccard FROM cand
        |WHERE est_jaccard >= 0.05 ORDER BY doc_new, doc_store""".stripMargin)) +
      ("dd_incremental_admit" -> (incCand + """
        |SELECT doc_id FROM toks WHERE doc_id % 10 = 0
        |  AND doc_id NOT IN (SELECT doc_new FROM cand WHERE est_jaccard >= 0.05)
        |ORDER BY doc_id""".stripMargin))
  }

  private def baseOracleSql: Map[String, String] = OracleAnn.entries ++ Map(
    // kernel-vs-golden verification join, replayed over the two scalar
    // span stores: a doc mismatches iff its full row set (every span
    // field) differs between stores. EXCEPT ALL both directions ≡ Spark's
    // exceptAll union; set ops treat NULLs as equal in both engines.
    "j5_golden_compare" ->
      """WITH k AS (SELECT doc_id, seq, kind, text, media_ref, "offset"
        |  FROM read_parquet('__WAREHOUSE__/graft_extract_spans/*.parquet')),
        |g AS (SELECT doc_id, seq, kind, text, media_ref, "offset"
        |  FROM read_parquet('__WAREHOUSE__/graft_golden_spans/*.parquet')),
        |mism AS (SELECT DISTINCT doc_id FROM (
        |  (SELECT * FROM k EXCEPT ALL SELECT * FROM g)
        |  UNION ALL
        |  (SELECT * FROM g EXCEPT ALL SELECT * FROM k))),
        |docs AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_id FROM k UNION ALL SELECT doc_id FROM g))
        |SELECT CAST((SELECT count(*) FROM docs) AS BIGINT) AS n_docs,
        | CAST((SELECT count(*) FROM mism) AS BIGINT) AS n_mismatches""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | floor(avg(l_quantity)*10000 + 0.5)/10000 AS avg_qty, count(*) AS n_rows
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment='BUILDING' AND c_custkey=o_custkey AND l_orderkey=o_orderkey
        | AND o_orderdate < TIMESTAMP '1998-06-01' AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "s1_ingest_checksum" ->
      """SELECT doc_id, sha256(text) AS checksum, n_chars FROM documents
        |WHERE n_chars <= 300 ORDER BY doc_id""".stripMargin,
    "s3_mail_attachments" ->
      """SELECT CAST(doc_id AS BIGINT) AS msg_id,
        | CAST(doc_id % 3 + 1 AS BIGINT) AS n_attachments,
        | CAST(list_sum([octet_length(encode(substr(text, i*11+1, 50)))
        |   for i in generate_series(0, CAST(doc_id % 3 AS INT))]) AS BIGINT) AS att_bytes
        |FROM documents ORDER BY msg_id""".stripMargin,
    "ocr_page_confidence" ->
      """WITH p AS (
        | SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  unnest([substr(text, (i-1)*300+1, 300)
        |    for i in generate_series(1, CAST(ceil(length(text)/300.0) AS BIGINT))]) AS pt
        | FROM documents WHERE length(text) > 0),
        |d AS (
        | SELECT doc_id, count(*) AS page_count,
        |  floor(avg(CAST(len(regexp_extract_all(pt, '[a-z ]')) AS DOUBLE)
        |        / length(pt)) * 10000 + 0.5) / 10000 AS avg_confidence,
        |  CAST(sum(len(regexp_extract_all(pt, '\S+'))) AS BIGINT) AS total_words
        | FROM p GROUP BY doc_id)
        |SELECT doc_id, page_count, avg_confidence, total_words,
        | CASE WHEN avg_confidence >= 0.9 THEN 'confirmed'
        |      WHEN avg_confidence >= 0.7 THEN 'probable'
        |      WHEN avg_confidence >= 0.4 THEN 'possible'
        |      ELSE 'unresolved' END AS confidence_level
        |FROM d ORDER BY doc_id""".stripMargin,
    // file listing via read_blob over the same directory the query scanned
    // (__SF_DIR__ substituted by Verify at dump time)
    "s4_dir_scan" ->
      """SELECT regexp_extract(filename, '([^/]+)$', 1) AS file,
        | size AS length
        |FROM read_blob('__SF_DIR__/*.parquet') ORDER BY file""".stripMargin,
    "p1_ilike_search" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE lower(text) LIKE '%scan%' OR lower(source) LIKE '%rc1%'
        |ORDER BY doc_id LIMIT 100""".stripMargin,
    "p2_eq_filter" ->
      "SELECT doc_id, n_chars FROM documents WHERE lang='es' AND source='src0' ORDER BY doc_id",
    "p3_status_set" ->
      """SELECT o_orderstatus, count(*) AS n FROM orders
        |WHERE o_orderstatus IN ('F','P') GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "p6_derived_overdue" ->
      """SELECT datediff('day', o_orderdate, TIMESTAMP '2001-09-01') > 365 AS is_overdue,
        | count(*) AS n FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "j1_fk_navigation" ->
      """SELECT r_name, n_name, count(*) AS n_orders, round(sum(o_totalprice),2) AS total
        |FROM region JOIN nation ON n_regionkey=r_regionkey
        | JOIN customer ON c_nationkey=n_nationkey JOIN orders ON o_custkey=c_custkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "j2_semi_parts" ->
      """SELECT p_brand, count(*) AS n_parts FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "j3_anti_customers" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey
        |  AND o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "j8_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "j9_skew_join" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM (SELECT CASE WHEN l_orderkey % 10 < 3 THEN 1 ELSE l_orderkey END AS fk,
        |             l_quantity FROM lineitem) f
        |JOIN orders ON fk = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "a2_status_counts" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders
        |GROUP BY o_orderstatus, o_orderpriority ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "a3_argmax_doc" ->
      """SELECT lang, doc_id, n_chars FROM (
        | SELECT lang, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rn
        | FROM documents) WHERE rn=1 ORDER BY lang""".stripMargin,
    "a4_avg_value" ->
      """SELECT event_type,
        | floor(avg(coalesce(value,0))*10000 + 0.5)/10000 AS avg_value, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a5_revenue_by_flag" ->
      """SELECT l_returnflag, round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a6_completion_ratio" ->
      """SELECT c_mktsegment,
        | floor(CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS DOUBLE)/count(*)
        |   * 10000 + 0.5)/10000 AS completion_rate, count(*) AS n
        |FROM orders JOIN customer ON o_custkey=c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "a8_pattern_count" ->
      """SELECT lang, CAST(sum(len(regexp_extract_all(text,'scan|join'))) AS BIGINT) AS n_matches
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "a10_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
        | count(*) AS n FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "a11_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS parts, count(DISTINCT l_suppkey) AS supps,
        | count(DISTINCT l_orderkey) AS orders FROM lineitem""".stripMargin,
    "a15_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        | coalesce(o_orderpriority, 'ALL') AS pr, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY st, pr""".stripMargin,
    "a13_product_agg" ->
      """SELECT l_returnflag, round(product(1.0 + l_discount), 6) AS disc_product,
        | count(*) AS n FROM lineitem WHERE l_orderkey <= 100
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a14_salted_groupby" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a12_cube" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS st, coalesce(o_orderpriority,'ALL') AS pr,
        | count(*) AS n FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY st, pr""".stripMargin,
    "f10_stagger_schedule" ->
      """WITH base AS (
        | SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS rn
        | FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 100)),
        |s AS (
        | SELECT o_orderkey,
        |  CAST(epoch(TIMESTAMP '2026-01-01 00:00:00') AS BIGINT)
        |   + CAST(floor(rn * 259200.0 / 100) AS BIGINT)
        |   + (o_orderkey * 2654435761) % 3601 - 1800 AS sec
        | FROM base)
        |SELECT o_orderkey,
        | CAST(CASE WHEN hour(make_timestamp(sec * 1000000)) >= 2
        |       AND hour(make_timestamp(sec * 1000000)) < 6
        |      THEN sec + 14400 ELSE sec END AS BIGINT) AS send_at_sec
        |FROM s ORDER BY o_orderkey""".stripMargin,
    "f13_page_cost" ->
      """SELECT doc_id, CAST(floor(n_chars / 3000) AS BIGINT) + 1 AS pages,
        | CAST(round((CAST(floor(n_chars / 3000) AS BIGINT) + 1) * 0.07, 2) AS DOUBLE) AS fax_cost,
        | CAST(round(0.63 + (CAST(floor(n_chars / 3000) AS BIGINT) + 1) * 0.15, 2) AS DOUBLE) AS mail_cost
        |FROM documents ORDER BY doc_id""".stripMargin,
    "w1_topk_docs" ->
      """SELECT lang, doc_id, n_chars, rank FROM (
        | SELECT lang, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rank
        | FROM documents) WHERE rank <= 10 ORDER BY lang, rank""".stripMargin,
    "w3_running_avg" ->
      """SELECT user_id, event_id,
        | floor((CAST(sum(CAST(round(value*100) AS BIGINT)) OVER w AS DOUBLE)
        |  / (count(*) OVER w * 100)) * 100 + 0.5) / 100 AS run_avg
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "w4_session_gaps" ->
      """SELECT user_id, event_id,
        | coalesce(epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER
        |  (PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_ms
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "w5_rank_customers" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (
        | SELECT c_nationkey, c_custkey, c_acctbal,
        |  rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk
        | FROM customer) WHERE rnk <= 5 ORDER BY c_nationkey, rnk""".stripMargin,
    "o1_top_docs" ->
      "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 50",
    "set_except_parts" ->
      """SELECT p_partkey FROM (SELECT p_partkey FROM part EXCEPT
        | SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01')
        |ORDER BY p_partkey LIMIT 200""".stripMargin,
    "set_intersect_custkeys" ->
      """SELECT count(*) AS n FROM
        |(SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)""".stripMargin,
    "set_union_ids" ->
      """SELECT count(*) AS n FROM
        |(SELECT c_custkey AS id FROM customer UNION SELECT o_custkey FROM orders)""".stripMargin,
    "f2_normalize_distinct" ->
      "SELECT DISTINCT lower(trim(c_mktsegment)) AS seg FROM customer ORDER BY seg",
    "sql_top_suppliers" ->
      """SELECT s_suppkey, s_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey, s_name ORDER BY revenue DESC, s_suppkey LIMIT 10""".stripMargin,
    "f8_regex_extract_groups" ->
      """SELECT regexp_extract(props, '"k": (\d+)', 1) AS k_str, count(*) AS n
        |FROM events GROUP BY k_str ORDER BY k_str""".stripMargin,
    "f9_date_buckets" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, CAST(month(o_orderdate) AS BIGINT) AS mo,
        | count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "f12_mime_infer" ->
      """SELECT CASE source WHEN 'src0' THEN 'application/pdf' WHEN 'src1' THEN 'text/html'
        |  WHEN 'src2' THEN 'text/plain' ELSE 'application/octet-stream' END AS mime,
        | count(*) AS n FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "f15_json_extract" ->
      """SELECT event_type,
        | floor(avg(CAST(json_extract_string(props,'$.k') AS BIGINT))*10000 + 0.5)/10000 AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "dd_exact_summary" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_docs,
        | CAST(count(DISTINCT md5(text)) AS BIGINT) AS distinct_texts FROM documents""".stripMargin,
    "dd_exact_survivors" ->
      """SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS copies
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    // same HUGEINT FNV fold as cf_native_fnv; Java's pmod over the SIGNED
    // view (2^64 is NOT divisible by 100, so the signed branch matters)
    "ta_split_counts" ->
      """WITH h AS (SELECT list_reduce(
        |    list_prepend(14695981039346656037::HUGEINT,
        |      [unicode(text[i])::HUGEINT for i in generate_series(1, length(text))]),
        |    (a, b) -> (xor(a, b) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |  ) AS hu FROM documents),
        |b AS (SELECT ((CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
        |    THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) % 100) + 100) % 100
        |  AS bucket FROM h)
        |SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
        |  ELSE 'test' END AS split, count(*) AS n
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    // same FNV-1a64 HUGEINT fold + signed-pmod as ta_split_counts, mod
    // 10000 sampling buckets, per-source thresholds as a CASE
    "ta_stratified_sample" ->
      """WITH h AS (SELECT source, n_chars, list_reduce(
        |    list_prepend(14695981039346656037::HUGEINT,
        |      [unicode(text[i])::HUGEINT for i in generate_series(1, length(text))]),
        |    (a, b) -> (xor(a, b) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |  ) AS hu FROM documents),
        |b AS (SELECT source, n_chars,
        |  ((CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
        |    THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) % 10000)
        |   + 10000) % 10000 AS bucket
        |  FROM h)
        |SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM b
        |WHERE bucket < CASE source WHEN 'src0' THEN 8000 WHEN 'src1' THEN 5000
        |  WHEN 'src2' THEN 2500 ELSE 1000 END
        |GROUP BY source ORDER BY source""".stripMargin,
    // Exact cross-engine reproduction of the MinHash+banded-LSH pipeline:
    // scala.util.hashing.MurmurHash3.stringHash re-expressed as a UBIGINT
    // mod-2^32 fold (mix/mixLast/finalization constants verbatim; validated
    // against MurmurRef values), per-seed signature minima over SIGNED ints,
    // band membership compared on the raw 4-slices (equal slices <=>
    // equal band hashes modulo astronomically-unlikely collisions),
    // est_jaccard = matches/64 (exact binary fraction in both engines).
    "dd_minhash_pairs" ->
      """WITH toks AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |docsh AS (
        |  SELECT doc_id, unnest(CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |    ELSE list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                        for i in generate_series(1, len(ws)-2)]) END) AS s
        |  FROM toks),
        |shd AS (SELECT DISTINCT s FROM docsh),
        |prep AS (
        |  SELECT s, length(s) AS n,
        |    [ (unicode(s[2*j-1])::UBIGINT * 65536 + unicode(s[2*j])::UBIGINT)
        |      for j in generate_series(1, length(s)//2) ] AS data,
        |    CASE WHEN length(s) % 2 = 1 THEN unicode(s[length(s)])::UBIGINT ELSE NULL END AS tail
        |  FROM shd),
        |seeded AS (
        |  SELECT s, n, data, tail, i AS seedix,
        |    (i::UBIGINT * 2654435769::UBIGINT + 1) % 4294967296 AS seed
        |  FROM prep, generate_series(0, 63) t(i)),
        |mixed AS (
        |  SELECT s, seedix, n, tail,
        |    list_reduce(list_prepend(seed, data), (h, k) -> (((((((xor(h, (((((((((k * 3432918353::UBIGINT) % 4294967296)) * 32768::UBIGINT) % 4294967296 + ((((k * 3432918353::UBIGINT) % 4294967296)) // 131072::UBIGINT))) % 4294967296) * 461845907::UBIGINT) % 4294967296))) * 8192::UBIGINT) % 4294967296 + ((xor(h, (((((((((k * 3432918353::UBIGINT) % 4294967296)) * 32768::UBIGINT) % 4294967296 + ((((k * 3432918353::UBIGINT) % 4294967296)) // 131072::UBIGINT))) % 4294967296) * 461845907::UBIGINT) % 4294967296))) // 524288::UBIGINT))) % 4294967296) * 5 + 3864292196::UBIGINT) % 4294967296)) AS h0
        |  FROM seeded),
        |tl AS (SELECT s, seedix, n,
        |  CASE WHEN tail IS NULL THEN h0 ELSE xor(h0, (((((((((tail * 3432918353::UBIGINT) % 4294967296)) * 32768::UBIGINT) % 4294967296 + ((((tail * 3432918353::UBIGINT) % 4294967296)) // 131072::UBIGINT))) % 4294967296) * 461845907::UBIGINT) % 4294967296)) END AS hh FROM mixed),
        |f3 AS (SELECT s, seedix,
        |  ((xor(h2, h2 // 8192) * 3266489909::UBIGINT) % 4294967296) AS h3 FROM (
        |   SELECT s, seedix, ((xor(h1, h1 // 65536) * 2246822507::UBIGINT) % 4294967296) AS h2 FROM (
        |    SELECT s, seedix, xor(hh, n::UBIGINT) AS h1 FROM tl))),
        |hv AS (SELECT s, seedix,
        |  CAST(CASE WHEN xor(h3, h3 // 65536) >= 2147483648::UBIGINT
        |    THEN xor(h3, h3 // 65536)::HUGEINT - 4294967296
        |    ELSE xor(h3, h3 // 65536)::HUGEINT END AS BIGINT) AS hs FROM f3),
        |sig AS (
        |  SELECT doc_id, list(min_h ORDER BY seedix) AS sig FROM (
        |    SELECT d.doc_id, h.seedix, min(h.hs) AS min_h
        |    FROM docsh d JOIN hv h ON d.s = h.s GROUP BY d.doc_id, h.seedix)
        |  GROUP BY doc_id),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(len(list_filter(generate_series(1, 64), p -> a.sig[p] = b.sig[p])) AS DOUBLE) / 64
        |      AS est_jaccard
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |  WHERE EXISTS (SELECT 1 FROM generate_series(0, 15) g(bd)
        |    WHERE a.sig[4*bd+1:4*bd+4] = b.sig[4*bd+1:4*bd+4]))
        |SELECT doc_a, doc_b, est_jaccard FROM cand
        |WHERE est_jaccard >= 0.05 ORDER BY doc_a, doc_b""".stripMargin,
    // SimHash: per-word FNV-1a64 (HUGEINT fold), 64 bit-votes, 16-bit-chunk
    // blocking re-expressed as an any-chunk-equal predicate over the n²
    // pair space (exact at oracle scale), hamming via bit_count on the
    // signed view.
    "dd_simhash_pairs" ->
      """WITH toks AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |hs AS (
        |  SELECT doc_id,
        |    [list_reduce(list_prepend(14695981039346656037::HUGEINT,
        |        [unicode(w[i])::HUGEINT for i in generate_series(1, length(w))]),
        |      (a, b) -> (xor(a, b) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)
        |     for w in ws] AS whs
        |  FROM toks),
        |fp AS (
        |  SELECT doc_id,
        |    list_sum([CASE WHEN list_sum([CASE WHEN (h // (1::HUGEINT << b)) % 2 = 1
        |        THEN 1 ELSE -1 END for h in whs]) > 0
        |      THEN (1::HUGEINT << b) ELSE 0::HUGEINT END
        |      for b in generate_series(0, 63)])::HUGEINT AS f
        |  FROM hs)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  bit_count(xor(
        |    CAST(CASE WHEN a.f >= 9223372036854775808::HUGEINT
        |      THEN a.f - 18446744073709551616::HUGEINT ELSE a.f END AS BIGINT),
        |    CAST(CASE WHEN b.f >= 9223372036854775808::HUGEINT
        |      THEN b.f - 18446744073709551616::HUGEINT ELSE b.f END AS BIGINT))) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE ((a.f // 1::HUGEINT) % 65536 = (b.f // 1::HUGEINT) % 65536
        |    OR (a.f // 65536::HUGEINT) % 65536 = (b.f // 65536::HUGEINT) % 65536
        |    OR (a.f // 4294967296::HUGEINT) % 65536 = (b.f // 4294967296::HUGEINT) % 65536
        |    OR (a.f // 281474976710656::HUGEINT) % 65536 = (b.f // 281474976710656::HUGEINT) % 65536)
        |  AND hamming <= 8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dd_embed_cosine" ->
      """SELECT vec_a, vec_b, sim FROM (
        | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  floor(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE)
        |    * 10000 + 0.5) / 10000 AS sim
        | FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |WHERE sim >= 0.4 ORDER BY vec_a, vec_b""".stripMargin,
    "dd_ngram_jaccard" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |  ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                      for i in generate_series(1, len(t)-2)]) END) AS s
        | FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        | FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, jaccard FROM (
        | SELECT doc_a, doc_b,
        |  floor(CAST(i AS DOUBLE) / (za.sz + zb.sz - i) * 10000 + 0.5) / 10000 AS jaccard
        | FROM inter JOIN sizes za ON doc_a = za.doc_id JOIN sizes zb ON doc_b = zb.doc_id)
        |WHERE jaccard >= 0.02 ORDER BY doc_a, doc_b""".stripMargin,
    // containment replay (T52): same shingle/pair CTEs, both asymmetric
    // ratios, max-gated at 0.5
    "dd_ngram_containment" ->
      """WITH toks AS (
        | SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |  ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                      for i in generate_series(1, len(t)-2)]) END) AS s
        | FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        | FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, containment_a, containment_b FROM (
        | SELECT doc_a, doc_b,
        |  floor(CAST(i AS DOUBLE) / za.sz * 10000 + 0.5) / 10000 AS containment_a,
        |  floor(CAST(i AS DOUBLE) / zb.sz * 10000 + 0.5) / 10000 AS containment_b
        | FROM inter JOIN sizes za ON doc_a = za.doc_id JOIN sizes zb ON doc_b = zb.doc_id)
        |WHERE greatest(containment_a, containment_b) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // same shingle/pair pipeline as dd_ngram_jaccard (rounded-then-filtered
    // at 0.5, matching the engine), then transitive closure by recursive
    // label propagation: seed every node with its own id, propagate labels
    // across undirected edges to a fixpoint (UNION dedups), component =
    // min reachable label — exactly the engine's hooked-min fixpoint
    "dd_neardup_clusters" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |  ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                      for i in generate_series(1, len(t)-2)]) END) AS s
        | FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        | FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   floor(CAST(i AS DOUBLE) / (za.sz + zb.sz - i) * 10000 + 0.5) / 10000 AS jaccard
        |  FROM inter JOIN sizes za ON doc_a = za.doc_id JOIN sizes zb ON doc_b = zb.doc_id)
        | WHERE jaccard >= 0.5),
        |und AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        |        UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, lab) AS (
        | SELECT u, u FROM und
        | UNION
        | SELECT e.v, r.lab FROM reach r JOIN und e ON e.u = r.node)
        |SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(lab) AS BIGINT) AS component
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    // leakage-free split replay: the dd_neardup_clusters pair pipeline +
    // closure, component rep = min doc_id (singletons their own rep), then
    // the ta_split_counts FNV-1a64 fold over the REP's text + signed pmod
    "ta_cluster_split" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |  ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                      for i in generate_series(1, len(t)-2)]) END) AS s
        | FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        | FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   floor(CAST(i AS DOUBLE) / (za.sz + zb.sz - i) * 10000 + 0.5) / 10000 AS jaccard
        |  FROM inter JOIN sizes za ON doc_a = za.doc_id JOIN sizes zb ON doc_b = zb.doc_id)
        | WHERE jaccard >= 0.5),
        |und AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        |        UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, lab) AS (
        | SELECT u, u FROM und
        | UNION
        | SELECT e.v, r.lab FROM reach r JOIN und e ON e.u = r.node),
        |comp AS (SELECT node, min(lab) AS cmp FROM reach GROUP BY node),
        |rp AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
        |         CAST(coalesce(c.cmp, d.doc_id) AS BIGINT) AS rep
        |       FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
        |h AS (SELECT CAST(doc_id AS BIGINT) AS rep_id, list_reduce(
        |    list_prepend(14695981039346656037::HUGEINT,
        |      [unicode(text[i])::HUGEINT for i in generate_series(1, length(text))]),
        |    (a, b) -> (xor(a, b) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |  ) AS hu FROM documents),
        |bk AS (SELECT rep_id, ((CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
        |    THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) % 100) + 100) % 100
        |  AS bucket FROM h)
        |SELECT r.doc_id, r.rep,
        | CASE WHEN bk.bucket < 80 THEN 'train' WHEN bk.bucket < 90 THEN 'val'
        |  ELSE 'test' END AS split
        |FROM rp r JOIN bk ON r.rep = bk.rep_id
        |ORDER BY r.doc_id""".stripMargin,
    "mm_meta_summary" ->
      """WITH m AS (
        | SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |   ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS n_bytes,
        |  floor(CAST(len(regexp_extract_all(text, '[\x00-\x2f]')) AS DOUBLE)
        |        / octet_length(encode(text)) * 10000 + 0.5) / 10000 AS dark_ratio
        | FROM documents)
        |SELECT kind, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        | floor(avg(dark_ratio) * 10000 + 0.5) / 10000 AS avg_dark_ratio
        |FROM m GROUP BY kind ORDER BY kind""".stripMargin,
    "mm_frame_stats" ->
      """SELECT doc_id AS media_id,
        | CAST(floor((octet_length(encode(text)) * 40 - 1) / 1000) + 1 AS BIGINT) AS n_frames,
        | CAST(floor((octet_length(encode(text)) * 40 - 1) / 1000) * 1000 AS BIGINT) AS last_frame_ms
        |FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""".stripMargin,
    "ta_lang_id" ->
      """WITH c AS (SELECT doc_id, lang AS actual,
        |  len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in)\b')) AS c_en,
        |  len(regexp_extract_all(lower(text), '\b(el|la|de|que|y|los)\b')) AS c_es,
        |  len(regexp_extract_all(lower(text), '\b(le|la|les|des|et|une)\b')) AS c_fr,
        |  len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|ein)\b')) AS c_de,
        |  len(regexp_extract_all(lower(text), '[一-鿿]')) AS c_zh
        | FROM documents)
        |SELECT doc_id, actual,
        | CASE WHEN greatest(c_en, c_es, c_fr, c_de, c_zh) = 0 THEN 'und'
        |  WHEN c_en = greatest(c_en, c_es, c_fr, c_de, c_zh) THEN 'en'
        |  WHEN c_es = greatest(c_en, c_es, c_fr, c_de, c_zh) THEN 'es'
        |  WHEN c_fr = greatest(c_en, c_es, c_fr, c_de, c_zh) THEN 'fr'
        |  WHEN c_de = greatest(c_en, c_es, c_fr, c_de, c_zh) THEN 'de'
        |  ELSE 'zh' END AS predicted
        |FROM c ORDER BY doc_id""".stripMargin,
    "sim_cosine_topk" ->
      """SELECT query_id, neighbor_id, rank,
        | floor(CAST(s AS DOUBLE) * 10000 + 0.5) / 10000 AS sim FROM (
        | SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY q.vec_id
        |   ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) AS rank,
        |  list_cosine_similarity(q.embedding, e.embedding) AS s
        | FROM embeddings q JOIN embeddings e ON q.vec_id < 8 AND e.vec_id != q.vec_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // reference-exact greedy paragraph packing replayed as a RECURSIVE CTE
    // over integer paragraph lengths: paraLen = len+2 (the +2 applies to
    // the FIRST para of a chunk too), flush strictly-greater, oversize
    // single para = own chunk; chunk length = running cur - 2 (one trailing
    // separator removed). A list_reduce fold expressed the same recurrence
    // through round 4, but DuckDB 1.0.0's list_reduce mis-evaluates
    // CASE-in-lambda folds on VECTORIZED batches (measured on the spans
    // store: 26/299 rows wrong in a batch, all correct row-at-a-time) —
    // round 4 passed only because that corpus's batch layout dodged the
    // bug; the recursive CTE advances every doc one paragraph per
    // iteration, row-wise by construction.
    "f6_chunker_docs" ->
      """WITH RECURSIVE w AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    [length(array_to_string(ws[i:i+6], ' '))
        |     for i in generate_series(1, len(ws), 7)] AS lens
        |  FROM w),
        |m AS (
        |  SELECT doc_id, lens,
        |    CASE WHEN len(lens) = 0 THEN 0
        |      ELSE list_sum(lens)::BIGINT + 2*(len(lens)-1) END AS t2len
        |  FROM p),
        |r AS (
        |  SELECT doc_id, lens, 1 AS i,
        |    0::BIGINT AS cur, 0::BIGINT AS n, 0::BIGINT AS mx, 0::BIGINT AS curk
        |  FROM m WHERE t2len > 80
        |  UNION ALL
        |  SELECT doc_id, lens, i + 1,
        |    CASE WHEN cur + lens[i] + 2 > 80 AND curk > 0
        |      THEN lens[i] + 2 ELSE cur + lens[i] + 2 END,
        |    CASE WHEN cur + lens[i] + 2 > 80 AND curk > 0 THEN n + 1 ELSE n END,
        |    CASE WHEN cur + lens[i] + 2 > 80 AND curk > 0
        |      THEN greatest(mx, cur - 2) ELSE mx END,
        |    CASE WHEN cur + lens[i] + 2 > 80 AND curk > 0 THEN 1::BIGINT ELSE curk + 1 END
        |  FROM r WHERE i <= len(lens)),
        |fin AS (
        |  SELECT doc_id, n + CASE WHEN curk > 0 THEN 1 ELSE 0 END AS n_chunks,
        |    greatest(mx, CASE WHEN curk > 0 THEN cur - 2 ELSE 0 END) AS max_chunk_chars
        |  FROM r WHERE i = len(lens) + 1)
        |SELECT doc_id,
        |  CASE WHEN t2len <= 80 THEN 1 ELSE fin.n_chunks END AS n_chunks,
        |  CASE WHEN t2len <= 80 THEN t2len ELSE fin.max_chunk_chars END AS max_chunk_chars
        |FROM m LEFT JOIN fin USING (doc_id) ORDER BY doc_id""".stripMargin,
    // the kernel-fed chunker face: same greedy-pack recurrence at cap 400
    // over each doc's "\n\n"-joined text spans, rebuilt from the
    // materialized extraction store (extractSpansStore) — string_agg over
    // only the kind='text' rows in span order
    "f6_chunker" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    coalesce(string_agg(CASE WHEN kind = 'text' THEN text END,
        |      chr(10) || chr(10) ORDER BY seq), '') AS text
        |  FROM read_parquet('__WAREHOUSE__/graft_extract_spans/*.parquet')
        |  GROUP BY doc_id),
        |p AS (SELECT doc_id, length(text) AS tlen,
        |    [length(q) for q in str_split(text, chr(10) || chr(10))] AS lens FROM t),
        |r AS (
        |  SELECT doc_id, lens, 1 AS i,
        |    0::BIGINT AS cur, 0::BIGINT AS n, 0::BIGINT AS mx, 0::BIGINT AS curk
        |  FROM p WHERE tlen > 400
        |  UNION ALL
        |  SELECT doc_id, lens, i + 1,
        |    CASE WHEN cur + lens[i] + 2 > 400 AND curk > 0
        |      THEN lens[i] + 2 ELSE cur + lens[i] + 2 END,
        |    CASE WHEN cur + lens[i] + 2 > 400 AND curk > 0 THEN n + 1 ELSE n END,
        |    CASE WHEN cur + lens[i] + 2 > 400 AND curk > 0
        |      THEN greatest(mx, cur - 2) ELSE mx END,
        |    CASE WHEN cur + lens[i] + 2 > 400 AND curk > 0 THEN 1::BIGINT ELSE curk + 1 END
        |  FROM r WHERE i <= len(lens)),
        |fin AS (
        |  SELECT doc_id, n + CASE WHEN curk > 0 THEN 1 ELSE 0 END AS n_chunks,
        |    greatest(mx, CASE WHEN curk > 0 THEN cur - 2 ELSE 0 END) AS max_chunk_chars
        |  FROM r WHERE i = len(lens) + 1)
        |SELECT doc_id,
        |  CASE WHEN tlen <= 400 THEN 1 ELSE fin.n_chunks END AS n_chunks,
        |  CASE WHEN tlen <= 400 THEN tlen ELSE fin.max_chunk_chars END AS max_chunk_chars
        |FROM p LEFT JOIN fin USING (doc_id) ORDER BY doc_id""".stripMargin,
    // ---- kernel-fed queries, oracled over the materialized extraction
    // spans (extractSpansStore; __WAREHOUSE__ substituted by Verify): the
    // kernel itself is pinned by golden parity; these replay everything
    // DOWNSTREAM of it — aggregation, linking, funnel — in DuckDB.
    "ex_kind_histogram" ->
      """SELECT kind, count(*) AS n
        |FROM read_parquet('__WAREHOUSE__/graft_extract_spans/*.parquet')
        |WHERE kind IS NOT NULL GROUP BY kind ORDER BY kind""".stripMargin,
    "ex_spans_per_doc" ->
      """SELECT doc_id, CAST(count(kind) AS BIGINT) AS n_spans
        |FROM read_parquet('__WAREHOUSE__/graft_extract_spans/*.parquet')
        |GROUP BY doc_id ORDER BY doc_id LIMIT 100""".stripMargin,
    "ex_entity_top" ->
      """SELECT kind, count(*) AS n
        |FROM read_parquet('__WAREHOUSE__/graft_extract_spans/*.parquet')
        |WHERE kind LIKE 'entity:%' GROUP BY kind ORDER BY n DESC, kind LIMIT 20""".stripMargin,
    // funnel replay: rebuild each doc's space-joined text (string_agg over
    // kind='text' rows in span order; aggregates skip the NULLed non-text
    // rows), then the CurationJob quality predicate + distinct content
    // hash. words=0 short-circuits the ratio conjuncts to false in both
    // engines (Spark: NaN comparisons are false; DuckDB: false AND NULL).
    "cu_curation_funnel" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    coalesce(string_agg(CASE WHEN kind = 'text' THEN text END, ' ' ORDER BY seq), '')
        |      AS text
        |  FROM read_parquet('__WAREHOUSE__/graft_extract_spans/*.parquet')
        |  GROUP BY doc_id),
        |q AS (SELECT text,
        |    len(regexp_extract_all(text, '\S+')) AS words,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in|is)\b')) AS stops,
        |    length(text) AS nchars FROM t),
        |g AS (SELECT text, (words >= 8
        |    AND CAST(stops AS DOUBLE) / words <= 0.9
        |    AND (CAST(nchars AS DOUBLE) - (words - 1)) / words >= 2.0) AS pass FROM q)
        |SELECT CAST(count(*) AS BIGINT) AS docs_in,
        |  CAST(coalesce(sum(CASE WHEN pass THEN 1 ELSE 0 END), 0) AS BIGINT) AS quality_pass,
        |  CAST(count(DISTINCT CASE WHEN pass THEN md5(text) END) AS BIGINT) AS curated,
        |  CAST(coalesce(sum(CASE WHEN pass THEN 1 ELSE 0 END), 0) AS BIGINT) AS copies_sum
        |FROM g""".stripMargin,
    // co-occurrence replay over the distinct (doc, type, norm) mention
    // projection; the (n_docs DESC, keys) order is total, so LIMIT is
    // deterministic in both engines
    "j6_cooccurrence" ->
      """WITH m AS (SELECT DISTINCT doc_id, substr(kind, 8) AS entity_type,
        |    lower(text) AS norm
        |  FROM read_parquet('__WAREHOUSE__/graft_extract_spans/*.parquet')
        |  WHERE kind LIKE 'entity:%'),
        |e AS (SELECT a.entity_type AS type_a, a.norm AS norm_a,
        |    b.entity_type AS type_b, b.norm AS norm_b,
        |    count(*) AS n_docs, min(a.doc_id) AS evidence_doc
        |  FROM m a JOIN m b ON a.doc_id = b.doc_id
        |    AND (a.entity_type < b.entity_type
        |      OR (a.entity_type = b.entity_type AND a.norm < b.norm))
        |  GROUP BY 1, 2, 3, 4)
        |SELECT type_a, norm_a, type_b, norm_b, 'co_mentioned' AS relation,
        |  n_docs, evidence_doc
        |FROM e WHERE n_docs >= 2
        |ORDER BY n_docs DESC, type_a, norm_a, type_b, norm_b LIMIT 100""".stripMargin,
    // alias-stats replay: exact-tier canonicals + the confidence bucket
    // (0.5 + n_docs·0.1 in DOUBLE arithmetic — DuckDB decimal literals
    // would use exact decimal math and disagree at the .9/.7 boundaries)
    "j7_entity_aliases" ->
      """WITH m AS (SELECT doc_id, substr(kind, 8) AS entity_type,
        |    text AS raw, lower(text) AS norm
        |  FROM read_parquet('__WAREHOUSE__/graft_extract_spans/*.parquet')
        |  WHERE kind LIKE 'entity:%'),
        |c AS (SELECT entity_type, norm, count(DISTINCT doc_id) AS n_docs,
        |    count(DISTINCT raw) AS n_aliases FROM m GROUP BY 1, 2),
        |l AS (SELECT entity_type, n_aliases,
        |    CASE WHEN conf >= 0.9 THEN 'confirmed' WHEN conf >= 0.7 THEN 'probable'
        |         WHEN conf >= 0.4 THEN 'possible' ELSE 'unresolved' END AS confidence_level
        |  FROM (SELECT *, least(CAST(1.0 AS DOUBLE),
        |      CAST(0.5 AS DOUBLE) + n_docs * CAST(0.1 AS DOUBLE)) AS conf FROM c))
        |SELECT entity_type, confidence_level, count(*) AS n_canonicals,
        |  CAST(sum(n_aliases) AS BIGINT) AS total_aliases,
        |  CAST(max(n_aliases) AS BIGINT) AS max_aliases
        |FROM l GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // full linking replay: exact tier, then the containment tier as a
    // direct substring join over the deduped canonicals (the engine's
    // 4-gram blocking is a candidate superset with exact contains()
    // verification, so the plain quadratic join over this small set is
    // semantically identical), cluster representative = min over edges
    "j4_entity_link" ->
      """WITH m AS (SELECT doc_id, substr(kind, 8) AS entity_type, lower(text) AS norm
        |  FROM read_parquet('__WAREHOUSE__/graft_extract_spans/*.parquet')
        |  WHERE kind LIKE 'entity:%'),
        |c AS (SELECT entity_type, norm, count(*) AS occurrences FROM m GROUP BY 1, 2),
        |s AS (SELECT entity_type, norm FROM c WHERE length(norm) > 3),
        |p AS (SELECT a.entity_type, a.norm AS short, b.norm AS big
        |  FROM s a JOIN s b ON a.entity_type = b.entity_type AND a.norm <> b.norm
        |    AND contains(b.norm, a.norm)),
        |e AS (SELECT entity_type, short AS norm, least(short, big) AS cand FROM p
        |  UNION ALL SELECT entity_type, big, least(short, big) FROM p),
        |k AS (SELECT entity_type, norm, min(cand) AS canonical_norm FROM e GROUP BY 1, 2),
        |l AS (SELECT c.entity_type, coalesce(k.canonical_norm, c.norm) AS canonical,
        |    c.occurrences
        |  FROM c LEFT JOIN k ON c.entity_type = k.entity_type AND c.norm = k.norm)
        |SELECT entity_type, count(*) AS n_canonicals,
        |  count(DISTINCT canonical) AS n_clusters,
        |  CAST(sum(occurrences) AS BIGINT) AS n_mentions
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,
    "ta_vocab_topk" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
        | SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS token
        | FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "ta_token_counts" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(text,'\S+')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text,'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // repetition replay: word lists via the same tokenization, 2-/3-grams by
    // list slicing; every ratio is integers-over-integer (floor half-up 4dp
    // both sides), and the flag compares the QUANTIZED ratio so both engines
    // sit on the same side of the 0.20 boundary
    "ta_repetition" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
        |u AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w),
        |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g FROM u WHERE i <= len(ws) - 1),
        |tg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g FROM u WHERE i <= len(ws) - 2),
        |bgc AS (SELECT doc_id, max(c) AS top, sum(c) AS n
        |  FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1),
        |tgc AS (SELECT doc_id, count(*) AS n, count(DISTINCT g) AS nd FROM tg GROUP BY 1),
        |base AS (SELECT doc_id, len(ws) AS n, len(list_distinct(ws)) AS nd FROM w)
        |SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_words,
        | floor(CASE WHEN b.n > 0 THEN CAST(b.n - b.nd AS DOUBLE) / b.n ELSE 0 END
        |   * 10000 + 0.5) / 10000 AS dup_word_ratio,
        | floor(CASE WHEN coalesce(bgc.n, 0) > 0 THEN CAST(bgc.top AS DOUBLE) / bgc.n ELSE 0 END
        |   * 10000 + 0.5) / 10000 AS top_bigram_ratio,
        | floor(CASE WHEN coalesce(tgc.n, 0) > 0 THEN CAST(tgc.n - tgc.nd AS DOUBLE) / tgc.n ELSE 0 END
        |   * 10000 + 0.5) / 10000 AS dup_trigram_ratio,
        | floor(CASE WHEN coalesce(bgc.n, 0) > 0 THEN CAST(bgc.top AS DOUBLE) / bgc.n ELSE 0 END
        |   * 10000 + 0.5) / 10000 >= CAST(0.2 AS DOUBLE) AS flagged
        |FROM base b LEFT JOIN bgc ON b.doc_id = bgc.doc_id
        |  LEFT JOIN tgc ON b.doc_id = tgc.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    // unigram-LM replay: same tokenization as ta_vocab_topk; the grand
    // total is a scalar cross join; avg neg-ln-prob quantized 4dp on BOTH
    // sides (summation order differs across engines) and the flag compares
    // the quantized value
    "ta_perplexity" ->
      """WITH w AS (SELECT doc_id,
        |  unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |dt AS (SELECT doc_id, token, count(*) AS c FROM w GROUP BY 1, 2),
        |v AS (SELECT token, count(*) AS n FROM w GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM v)
        |SELECT dt.doc_id, CAST(sum(dt.c) AS BIGINT) AS n_tokens,
        | floor(sum(dt.c * -ln(CAST(v.n AS DOUBLE) / tot.t)) / sum(dt.c)
        |   * 10000 + 0.5) / 10000 AS avg_neg_logprob,
        | floor(sum(dt.c * -ln(CAST(v.n AS DOUBLE) / tot.t)) / sum(dt.c)
        |   * 10000 + 0.5) / 10000 >= CAST(3.5 AS DOUBLE) AS flagged
        |FROM dt JOIN v USING (token), tot
        |GROUP BY dt.doc_id ORDER BY dt.doc_id""".stripMargin,
    // held-out-LM replay: vocab from the train slice only, eval docs LEFT
    // JOIN it, OOV at the Laplace floor (coalesce(n, 1)); doc_id ≥ 0 in
    // the documents table so % matches Spark's pmod
    "ta_perplexity_heldout" ->
      """WITH w AS (SELECT doc_id,
        |  unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |v AS (SELECT token, count(*) AS n FROM w WHERE doc_id % 20 <> 0 GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM v),
        |dt AS (SELECT doc_id, token, count(*) AS c FROM w
        |  WHERE doc_id % 20 = 0 GROUP BY 1, 2)
        |SELECT dt.doc_id, CAST(sum(dt.c) AS BIGINT) AS n_tokens,
        | floor(sum(dt.c * -ln(CAST(coalesce(v.n, 1) AS DOUBLE) / tot.t)) / sum(dt.c)
        |   * 10000 + 0.5) / 10000 AS avg_neg_logprob,
        | floor(sum(dt.c * -ln(CAST(coalesce(v.n, 1) AS DOUBLE) / tot.t)) / sum(dt.c)
        |   * 10000 + 0.5) / 10000 >= CAST(3.5 AS DOUBLE) AS flagged
        |FROM dt LEFT JOIN v USING (token), tot
        |GROUP BY dt.doc_id ORDER BY dt.doc_id""".stripMargin,
    // sequence-packing replay: greedy first-fit scan per shard is a
    // recursive CTE advancing one document per iteration per shard (the
    // same one-step-per-row pattern as the chunker oracle — a cumulative
    // sum that RESETS on overflow is not a window function)
    "ta_seq_pack" ->
      """WITH RECURSIVE d AS (
        |  SELECT ((doc_id % 64) + 64) % 64 AS shard, doc_id,
        |    len(regexp_extract_all(text, '\S+')) AS n_tok,
        |    row_number() OVER (PARTITION BY ((doc_id % 64) + 64) % 64
        |      ORDER BY doc_id) AS i
        |  FROM documents),
        |r AS (
        |  SELECT shard, i, doc_id, n_tok, 0 AS bin, n_tok AS fill
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT d.shard, d.i, d.doc_id, d.n_tok,
        |    CASE WHEN r.fill + d.n_tok <= 512 THEN r.bin ELSE r.bin + 1 END,
        |    CASE WHEN r.fill + d.n_tok <= 512 THEN r.fill + d.n_tok ELSE d.n_tok END
        |  FROM r JOIN d ON d.shard = r.shard AND d.i = r.i + 1)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard, CAST(bin AS BIGINT) AS bin,
        |  CAST(n_tok AS BIGINT) AS n_tok
        |FROM r ORDER BY doc_id""".stripMargin,
    // epoch-shuffle replay: the same HUGEINT FNV fold as ta_split_counts
    // over the "epoch:doc_id" string, signed view for both the shard pmod
    // and the in-shard ORDER BY (Spark's key column is a signed long)
    "ta_epoch_shuffle" ->
      """WITH d AS (SELECT doc_id, unnest(generate_series(0, 1)) AS epoch FROM documents),
        |h AS (SELECT doc_id, epoch, list_reduce(
        |    list_prepend(14695981039346656037::HUGEINT,
        |      [unicode(s[i])::HUGEINT for i in generate_series(1, length(s))]),
        |    (a, b) -> (xor(a, b) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |  ) AS hu FROM (SELECT doc_id, epoch,
        |    epoch::VARCHAR || ':' || doc_id::VARCHAR AS s FROM d)),
        |k AS (SELECT doc_id, epoch,
        |  CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
        |    THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) AS k
        |  FROM h)
        |SELECT CAST(epoch AS BIGINT) AS epoch,
        |  ((k % 8) + 8) % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY epoch, ((k % 8) + 8) % 8
        |    ORDER BY k, doc_id) AS BIGINT) AS ord,
        |  doc_id
        |FROM k ORDER BY epoch, shard, ord""".stripMargin,
    // calibration replay: same quantized stopword ratio as
    // ta_quality_score, ranked per source; the percentile is the value at
    // integer rank ⌈p·n⌉, so every output is an actual data value (exact
    // across engines — no interpolation arithmetic)
    "ta_quality_calibration" ->
      """WITH q AS (SELECT doc_id, source,
        |  floor(CASE WHEN len(regexp_extract_all(text,'\S+')) > 0
        |   THEN CAST(len(regexp_extract_all(lower(text),'\b(the|and|of|to|a|in|is)\b')) AS DOUBLE)
        |        / len(regexp_extract_all(text,'\S+')) ELSE 0 END * 10000 + 0.5) / 10000 AS sr
        |  FROM documents),
        |r AS (SELECT source, sr,
        |  row_number() OVER (PARTITION BY source ORDER BY sr, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n FROM q)
        |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
        |  max(CASE WHEN rn = (10*n + 99) // 100 THEN sr END) AS stop_p10,
        |  max(CASE WHEN rn = (50*n + 99) // 100 THEN sr END) AS stop_p50,
        |  max(CASE WHEN rn = (90*n + 99) // 100 THEN sr END) AS stop_p90
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    // budget-selection replay: the naive single-window form — per-source
    // running token sum ordered (stopword ratio DESC, doc_id), explicit
    // ROWS frame, inclusive-cum ≤ 800 keep rule; all integer arithmetic,
    // bit-equal to the engine's two-phase prefix sum by OpsSpec's pinning
    "ta_budget_select" ->
      """WITH q AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
        |  floor(CASE WHEN len(regexp_extract_all(text,'\S+')) > 0
        |   THEN CAST(len(regexp_extract_all(lower(text),'\b(the|and|of|to|a|in|is)\b')) AS DOUBLE)
        |        / len(regexp_extract_all(text,'\S+')) ELSE 0 END * 10000 + 0.5) / 10000 AS ratio,
        |  CAST(len(regexp_extract_all(text,'\S+')) AS BIGINT) AS tokens
        |  FROM documents),
        |c AS (SELECT doc_id, source, ratio, tokens,
        |  sum(tokens) OVER (PARTITION BY source ORDER BY ratio DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM q)
        |SELECT doc_id, source, ratio, tokens,
        |  CAST(cum AS BIGINT) AS cum_tokens, cum <= 800 AS kept
        |FROM c ORDER BY doc_id""".stripMargin,
    // mixing-weights replay: per-source token totals, τ=0.5 power
    // normalized by the scalar sum, quantized 4dp both sides
    "ta_mix_weights" ->
      """WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |z AS (SELECT sum(pow(CAST(n_tokens AS DOUBLE), CAST(0.5 AS DOUBLE))) AS z FROM per)
        |SELECT source, n_docs, n_tokens,
        |  floor(pow(CAST(n_tokens AS DOUBLE), CAST(0.5 AS DOUBLE)) / z.z
        |    * 10000 + 0.5) / 10000 AS weight
        |FROM per, z ORDER BY source""".stripMargin,
    // substring-dedup replay: positional 8-token windows (1-based here,
    // 0-based in the engine — the covered-position COUNT is offset-
    // invariant), duplicated = ≥2 distinct docs, canonical = min doc_id,
    // covered positions counted DISTINCT; flag is the exact integer
    // n_dup_tok*5 >= n_tok comparison (no float near the threshold)
    "dd_substring_stats" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
        |occ AS (
        |  SELECT doc_id, i AS pos, array_to_string(ws[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i
        |        FROM w WHERE len(ws) >= 8)),
        |dup AS (SELECT g, min(doc_id) AS w_min FROM occ
        |        GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT doc_id, pos + j AS p FROM (
        |    SELECT o.doc_id, o.pos, unnest(generate_series(0, 7)) AS j
        |    FROM occ o JOIN dup d ON o.g = d.g WHERE o.doc_id <> d.w_min)),
        |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_tok FROM cov GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tok FROM w)
        |SELECT t.doc_id, t.n_tok, coalesce(c.n_dup_tok, 0) AS n_dup_tok,
        |  floor(CAST(coalesce(c.n_dup_tok, 0) AS DOUBLE) / greatest(t.n_tok, 1)
        |    * 10000 + 0.5) / 10000 AS dup_ratio,
        |  (coalesce(c.n_dup_tok, 0) * 5 >= t.n_tok
        |    AND coalesce(c.n_dup_tok, 0) > 0) AS flagged
        |FROM tot t LEFT JOIN cnt c ON t.doc_id = c.doc_id ORDER BY t.doc_id""".stripMargin,
    // removal-face replay: same window/dup/covered chain, then the token
    // stream anti-joins the covered positions and reassembles via
    // position-ordered string_agg (1-based here, 0-based in Spark — the
    // offset is consistent within each engine so the kept set is identical)
    "dd_substring_rewrite" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
        |occ AS (
        |  SELECT doc_id, i AS pos, array_to_string(ws[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i
        |        FROM w WHERE len(ws) >= 8)),
        |dup AS (SELECT g, min(doc_id) AS w_min FROM occ
        |        GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT doc_id, pos + j AS p FROM (
        |    SELECT o.doc_id, o.pos, unnest(generate_series(0, 7)) AS j
        |    FROM occ o JOIN dup d ON o.g = d.g WHERE o.doc_id <> d.w_min)),
        |tp AS (SELECT doc_id, i AS p, ws[i] AS tok
        |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w)),
        |kept AS (SELECT tp.doc_id, tp.p, tp.tok FROM tp
        |  ANTI JOIN cov ON tp.doc_id = cov.doc_id AND tp.p = cov.p),
        |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(tok, ' ' ORDER BY p) AS text_dedup FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, t.n_tok, coalesce(r.n_kept, 0) AS n_kept,
        |  coalesce(r.text_dedup, '') AS text_dedup
        |FROM (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tok FROM w) t
        |LEFT JOIN reb r ON t.doc_id = r.doc_id ORDER BY t.doc_id""".stripMargin,
    // Stupid-Backoff bigram LM replay: doc bigrams from list slices,
    // count tables on the doc_id%5<>0 slice, seen → ln(bc/U(u)), unseen →
    // ln(0.4·(U(w)+1)/(N+V)), per-doc 4dp avg + exact-integer hit rate
    "ta_bigram_lm" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
        |bi AS (SELECT doc_id, ws[i] AS u, ws[i+1] AS wd
        |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
        |        FROM w WHERE len(ws) >= 2)),
        |docbi AS (SELECT doc_id, u, wd, CAST(count(*) AS BIGINT) AS c
        |  FROM bi GROUP BY doc_id, u, wd),
        |bitab AS (SELECT u, wd, CAST(sum(c) AS BIGINT) AS bc FROM docbi
        |  WHERE doc_id % 5 <> 0 GROUP BY u, wd),
        |unitab AS (SELECT tok, CAST(count(*) AS BIGINT) AS uc FROM (
        |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        |    FROM documents) WHERE doc_id % 5 <> 0 GROUP BY tok),
        |norm AS (SELECT CAST(sum(uc) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v
        |  FROM unitab),
        |sc AS (SELECT d.doc_id, d.c,
        |    CASE WHEN b.bc IS NOT NULL THEN ln(CAST(b.bc AS DOUBLE) / uu.uc)
        |      ELSE ln(0.4 * CAST(coalesce(uw.uc, 0) + 1 AS DOUBLE) / (norm.n + norm.v))
        |    END AS lp,
        |    CASE WHEN b.bc IS NOT NULL THEN d.c ELSE 0 END AS hits
        |  FROM docbi d
        |  LEFT JOIN bitab b ON d.u = b.u AND d.wd = b.wd
        |  LEFT JOIN unitab uu ON d.u = uu.tok
        |  LEFT JOIN unitab uw ON d.wd = uw.tok, norm),
        |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |    floor(sum(c * lp) / sum(c) * 10000 + 0.5) / 10000 AS avg_lp,
        |    floor(CAST(sum(hits) AS DOUBLE) / sum(c) * 10000 + 0.5) / 10000 AS hit_rate
        |  FROM sc GROUP BY doc_id)
        |SELECT dd.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
        |  coalesce(a.avg_lp, 0.0) AS avg_lp, coalesce(a.hit_rate, 0.0) AS hit_rate
        |FROM (SELECT DISTINCT doc_id FROM documents) dd
        |LEFT JOIN agg a ON dd.doc_id = a.doc_id ORDER BY dd.doc_id""".stripMargin,
    // NB classifier replay: FNV HUGEINT fold → bucket (the ta_dsir_weights
    // ladder), per-class Laplace log-probs + priors on the doc_id%5<>0
    // split, per-(doc, class) score 4dp-quantized, argmax via
    // row_number(score DESC, label) — Spark's min(struct(-score, label))
    "ta_nb_classify" -> (nbClassifySqlCore + """
      |SELECT doc_id, label, pred, score, correct, holdout FROM nbout
      |ORDER BY doc_id""".stripMargin),
    // confidence-AUC replay (T51): per-distinct-score counts, the T38
    // two-phase prefix (bucket subtotal window + intra-bucket window),
    // integer 2R+ rank-sum, final integer-over-integer ratio 6dp
    "ta_confidence_auc" -> (nbClassifySqlCore + """,
      |h AS (SELECT score, CASE WHEN correct THEN 1 ELSE 0 END AS c
      |  FROM nbout WHERE holdout),
      |g AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c) AS BIGINT) AS np FROM h GROUP BY score),
      |g2 AS (SELECT score, n, np, CAST(floor(score) AS BIGINT) AS bkt FROM g),
      |bt AS (SELECT bkt, CAST(sum(n) AS BIGINT) AS bn FROM g2 GROUP BY bkt),
      |btp AS (SELECT bkt, CAST(coalesce(sum(bn) OVER (ORDER BY bkt
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre
      |  FROM bt),
      |g3 AS (SELECT g2.np, g2.n, btp.pre + CAST(coalesce(sum(g2.n) OVER (
      |      PARTITION BY g2.bkt ORDER BY g2.score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cg
      |  FROM g2 JOIN btp ON g2.bkt = btp.bkt),
      |agg AS (SELECT CAST(sum(np * (2 * cg + n + 1)) AS BIGINT) AS r2,
      |    CAST(sum(np) AS BIGINT) AS npos, CAST(sum(n) AS BIGINT) AS ntot
      |  FROM g3)
      |SELECT npos AS n_pos, ntot - npos AS n_neg,
      |  CASE WHEN npos > 0 AND ntot - npos > 0 THEN
      |    floor(CAST(r2 - npos * (npos + 1) AS DOUBLE)
      |      / CAST(2 * npos * (ntot - npos) AS DOUBLE) * 1e6 + 0.5) / 1e6
      |  ELSE NULL END AS auc
      |FROM agg""".stripMargin),
    // DSIR replay: per-token FNV-1a64 HUGEINT fold (the ta_split_counts
    // pattern applied per token) → signed-pmod bucket, Laplace-smoothed
    // log-likelihood-ratio per bucket, Σ count·dlog per doc, 4dp quantized
    "ta_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok FROM documents),
        |hb AS (
        |  SELECT doc_id, ((CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
        |      THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) % 4096)
        |    + 4096) % 4096 AS b
        |  FROM (SELECT doc_id, list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        [unicode(tok[i])::HUGEINT for i in generate_series(1, length(tok))]),
        |      (a, x) -> (xor(a, x) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |    ) AS hu FROM toks)),
        |docb AS (SELECT doc_id, b, count(*) AS c FROM hb GROUP BY doc_id, b),
        |raw AS (SELECT b, sum(c) AS rc FROM docb GROUP BY b),
        |tgt AS (SELECT h.b, count(*) AS tc FROM hb h JOIN documents d ON h.doc_id = d.doc_id
        |        WHERE d.source = 'src0' GROUP BY h.b),
        |rt AS (SELECT CAST(sum(rc) AS BIGINT) AS rt FROM raw),
        |tt AS (SELECT CAST(sum(tc) AS BIGINT) AS tt FROM tgt),
        |dist AS (
        |  SELECT coalesce(raw.b, tgt.b) AS b,
        |    ln(CAST(coalesce(tc, 0) + 1 AS DOUBLE) / (tt.tt + 4096))
        |      - ln(CAST(coalesce(rc, 0) + 1 AS DOUBLE) / (rt.rt + 4096)) AS dlog
        |  FROM raw FULL JOIN tgt ON raw.b = tgt.b, rt, tt),
        |sc AS (SELECT docb.doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
        |    floor(sum(c * dlog) * 10000 + 0.5) / 10000 AS log_w
        |  FROM docb JOIN dist ON docb.b = dist.b GROUP BY docb.doc_id)
        |SELECT d.doc_id, coalesce(sc.n_tok, 0) AS n_tok,
        |  coalesce(sc.log_w, 0.0) AS log_w, coalesce(sc.log_w, 0.0) > 0 AS keep
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN sc ON d.doc_id = sc.doc_id ORDER BY d.doc_id""".stripMargin,
    // source-divergence replay (T47): the DSIR FNV bucket ladder keyed by
    // source, full 4096-bucket domain per source (zero-count buckets carry
    // their smoothed mass), KL/JS sums 4dp-quantized on both sides
    "ta_source_divergence" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS tok FROM documents),
        |hb AS (
        |  SELECT source, ((CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
        |      THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) % 4096)
        |    + 4096) % 4096 AS b
        |  FROM (SELECT source, list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        [unicode(tok[i])::HUGEINT for i in generate_series(1, length(tok))]),
        |      (a, x) -> (xor(a, x) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |    ) AS hu FROM toks)),
        |sb AS (SELECT source, b, count(*) AS c FROM hb GROUP BY 1, 2),
        |cb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cc FROM sb GROUP BY 1),
        |stt AS (SELECT source, CAST(sum(c) AS BIGINT) AS st FROM sb GROUP BY 1),
        |ctt AS (SELECT CAST(sum(cc) AS BIGINT) AS ct FROM cb),
        |dom AS (SELECT s.source, s.st, g.b FROM stt s
        |  CROSS JOIN (SELECT unnest(generate_series(0, 4095)) AS b) g),
        |t AS (SELECT d.source, d.st,
        |    CAST(coalesce(sb.c, 0) + 1 AS DOUBLE) / (d.st + 4096) AS p,
        |    CAST(coalesce(cb.cc, 0) + 1 AS DOUBLE) / (ctt.ct + 4096) AS q
        |  FROM dom d LEFT JOIN sb ON sb.source = d.source AND sb.b = d.b
        |    LEFT JOIN cb ON cb.b = d.b CROSS JOIN ctt)
        |SELECT source, max(st) AS n_tok,
        |  floor(sum(p * ln(p / q)) * 10000 + 0.5) / 10000 AS kl_vs_corpus,
        |  floor(sum(CAST(0.5 AS DOUBLE) * (p * ln(p / ((p + q) / 2)))
        |    + CAST(0.5 AS DOUBLE) * (q * ln(q / ((p + q) / 2)))) * 10000 + 0.5) / 10000
        |    AS js_vs_corpus
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    // BM25 replay (T45): per-doc length + per-term tf in ONE conditional
    // aggregation, corpus stats in a 1-row cross join; every fractional
    // literal CAST AS DOUBLE (DuckDB decimal-literal gotcha), expression
    // order mirrors the Spark tree exactly, score 4dp-quantized with
    // ties at the k-boundary broken by doc_id
    "ret_bm25_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok FROM documents),
        |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl,
        |    CAST(sum(CASE WHEN tok = 'dup' THEN 1 ELSE 0 END) AS BIGINT) AS tf0,
        |    CAST(sum(CASE WHEN tok = 'spark' THEN 1 ELSE 0 END) AS BIGINT) AS tf1,
        |    CAST(sum(CASE WHEN tok = 'window' THEN 1 ELSE 0 END) AS BIGINT) AS tf2
        |  FROM toks GROUP BY doc_id),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |  FROM pd)
        |SELECT doc_id, n_tokens, n_terms, score FROM (
        |  SELECT doc_id, dl AS n_tokens,
        |    CAST((CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms,
        |    floor((
        |      (CASE WHEN tf0 > 0 THEN ln(CAST(1 AS DOUBLE)
        |          + (n_docs - df0 + CAST(0.5 AS DOUBLE)) / (df0 + CAST(0.5 AS DOUBLE)))
        |        * (CAST(tf0 AS DOUBLE) * CAST(2.2 AS DOUBLE)
        |          / (CAST(tf0 AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
        |            + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE) / avgdl)))
        |        ELSE CAST(0 AS DOUBLE) END)
        |      + (CASE WHEN tf1 > 0 THEN ln(CAST(1 AS DOUBLE)
        |          + (n_docs - df1 + CAST(0.5 AS DOUBLE)) / (df1 + CAST(0.5 AS DOUBLE)))
        |        * (CAST(tf1 AS DOUBLE) * CAST(2.2 AS DOUBLE)
        |          / (CAST(tf1 AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
        |            + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE) / avgdl)))
        |        ELSE CAST(0 AS DOUBLE) END)
        |      + (CASE WHEN tf2 > 0 THEN ln(CAST(1 AS DOUBLE)
        |          + (n_docs - df2 + CAST(0.5 AS DOUBLE)) / (df2 + CAST(0.5 AS DOUBLE)))
        |        * (CAST(tf2 AS DOUBLE) * CAST(2.2 AS DOUBLE)
        |          / (CAST(tf2 AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
        |            + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE) / avgdl)))
        |        ELSE CAST(0 AS DOUBLE) END)
        |    ) * 10000 + 0.5) / 10000 AS score
        |  FROM pd CROSS JOIN st)
        |WHERE n_terms > 0 ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // PageRank replay (T46): 4 unrolled rank iterations in exact integer
    // arithmetic — every floor() sits on a double quotient whose distance
    // from the boundary is >= 1/denominator >> ulp, so both engines land
    // on identical BIGINTs; generated CTE chain (the ta_bpe_merges
    // unrolling pattern)
    "gr_pagerank" -> pageRankSql(4),
    // weighted replay (T53): per-edge floored shares over summed weights
    "gr_pagerank_weighted" -> pageRankWeightedSql(4),
    // personalized variant (T49): same generated chain, |S| and the
    // start/teleport mass gated by the PERSON: seed predicate
    "gr_pagerank_seeded" -> pageRankSql(4, seedLike = Some("PERSON:%")),
    // triangle replay (T50): degree-ordered orientation + wedge closure,
    // exact longs end to end
    "gr_triangles" -> triangleSql,
    // snapshot-diff replay (T48): the oracle compares text equality
    // directly where the operator compares fnv1a64(text) — mechanism-
    // independent agreement (the hashed-vs-string gram-form doctrine)
    "ta_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id, source,
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  coalesce(n.source, o.source) AS source,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM o FULL JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,
    // BPE pair replay: corpus → distinct-word vocab with frequencies,
    // adjacent character pairs weighted by word freq, top-20 count-desc
    // with (l, r) ascending tie-break
    "ta_bpe_pairs" ->
      """WITH wf AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS w FROM documents)
        |  GROUP BY w),
        |p AS (SELECT w[i:i] AS l, w[i+1:i+1] AS r, freq
        |  FROM (SELECT w, freq, unnest(generate_series(1, length(w) - 1)) AS i
        |        FROM wf WHERE length(w) >= 2))
        |SELECT l, r, CAST(sum(freq) AS BIGINT) AS n
        |FROM p GROUP BY l, r ORDER BY n DESC, l, r LIMIT 20""".stripMargin,
    // BPE merge-loop replay, 4 unrolled levels: words encoded as
    // symbol+U+0001 strings (every symbol FOLLOWED by the separator, so a
    // left-to-right non-overlapping replace IS the greedy merge), each
    // level = pair-count agg → 1-row argmax (ties (l,r) asc) → replace
    "ta_bpe_merges" ->
      """WITH v1 AS (SELECT array_to_string(
        |      [w[i:i] || chr(1) for i in generate_series(1, length(w))], '') AS enc, freq
        |  FROM (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        |      SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS w FROM documents)
        |    GROUP BY w)),
        |p1 AS (SELECT syms[i] AS l, syms[i+1] AS r, freq
        |  FROM (SELECT syms, freq, unnest(generate_series(1, len(syms) - 1)) AS i
        |        FROM (SELECT list_filter(string_split(enc, chr(1)), x -> x <> '') AS syms,
        |              freq FROM v1))),
        |b1 AS (SELECT l, r, CAST(sum(freq) AS BIGINT) AS n FROM p1 GROUP BY l, r
        |       ORDER BY n DESC, l, r LIMIT 1),
        |v2 AS (SELECT replace(enc, b.l || chr(1) || b.r || chr(1), b.l || b.r || chr(1)) AS enc,
        |       freq FROM v1, b1 b),
        |p2 AS (SELECT syms[i] AS l, syms[i+1] AS r, freq
        |  FROM (SELECT syms, freq, unnest(generate_series(1, len(syms) - 1)) AS i
        |        FROM (SELECT list_filter(string_split(enc, chr(1)), x -> x <> '') AS syms,
        |              freq FROM v2))),
        |b2 AS (SELECT l, r, CAST(sum(freq) AS BIGINT) AS n FROM p2 GROUP BY l, r
        |       ORDER BY n DESC, l, r LIMIT 1),
        |v3 AS (SELECT replace(enc, b.l || chr(1) || b.r || chr(1), b.l || b.r || chr(1)) AS enc,
        |       freq FROM v2, b2 b),
        |p3 AS (SELECT syms[i] AS l, syms[i+1] AS r, freq
        |  FROM (SELECT syms, freq, unnest(generate_series(1, len(syms) - 1)) AS i
        |        FROM (SELECT list_filter(string_split(enc, chr(1)), x -> x <> '') AS syms,
        |              freq FROM v3))),
        |b3 AS (SELECT l, r, CAST(sum(freq) AS BIGINT) AS n FROM p3 GROUP BY l, r
        |       ORDER BY n DESC, l, r LIMIT 1),
        |v4 AS (SELECT replace(enc, b.l || chr(1) || b.r || chr(1), b.l || b.r || chr(1)) AS enc,
        |       freq FROM v3, b3 b),
        |p4 AS (SELECT syms[i] AS l, syms[i+1] AS r, freq
        |  FROM (SELECT syms, freq, unnest(generate_series(1, len(syms) - 1)) AS i
        |        FROM (SELECT list_filter(string_split(enc, chr(1)), x -> x <> '') AS syms,
        |              freq FROM v4))),
        |b4 AS (SELECT l, r, CAST(sum(freq) AS BIGINT) AS n FROM p4 GROUP BY l, r
        |       ORDER BY n DESC, l, r LIMIT 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS INTEGER) AS iter, l, r, n FROM b1
        |  UNION ALL SELECT CAST(2 AS INTEGER), l, r, n FROM b2
        |  UNION ALL SELECT CAST(3 AS INTEGER), l, r, n FROM b3
        |  UNION ALL SELECT CAST(4 AS INTEGER), l, r, n FROM b4)
        |ORDER BY iter""".stripMargin,
    // BPE apply replay: the same 4-iteration merge ladder but carrying the
    // word through every vocab CTE; final per-word token count = symbols
    // of the fully-merged encoding; per-doc counts join the distinct-word
    // table (fan-out 1) — all integer sums
    "ta_bpe_encode" ->
      """WITH v1 AS (SELECT w, array_to_string(
        |      [w[i:i] || chr(1) for i in generate_series(1, length(w))], '') AS enc, freq
        |  FROM (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        |      SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS w FROM documents)
        |    GROUP BY w)),
        |p1 AS (SELECT syms[i] AS l, syms[i+1] AS r, freq
        |  FROM (SELECT syms, freq, unnest(generate_series(1, len(syms) - 1)) AS i
        |        FROM (SELECT list_filter(string_split(enc, chr(1)), x -> x <> '') AS syms,
        |              freq FROM v1))),
        |b1 AS (SELECT l, r FROM p1 GROUP BY l, r
        |       ORDER BY CAST(sum(freq) AS BIGINT) DESC, l, r LIMIT 1),
        |v2 AS (SELECT w, replace(enc, b.l || chr(1) || b.r || chr(1), b.l || b.r || chr(1)) AS enc,
        |       freq FROM v1, b1 b),
        |p2 AS (SELECT syms[i] AS l, syms[i+1] AS r, freq
        |  FROM (SELECT syms, freq, unnest(generate_series(1, len(syms) - 1)) AS i
        |        FROM (SELECT list_filter(string_split(enc, chr(1)), x -> x <> '') AS syms,
        |              freq FROM v2))),
        |b2 AS (SELECT l, r FROM p2 GROUP BY l, r
        |       ORDER BY CAST(sum(freq) AS BIGINT) DESC, l, r LIMIT 1),
        |v3 AS (SELECT w, replace(enc, b.l || chr(1) || b.r || chr(1), b.l || b.r || chr(1)) AS enc,
        |       freq FROM v2, b2 b),
        |p3 AS (SELECT syms[i] AS l, syms[i+1] AS r, freq
        |  FROM (SELECT syms, freq, unnest(generate_series(1, len(syms) - 1)) AS i
        |        FROM (SELECT list_filter(string_split(enc, chr(1)), x -> x <> '') AS syms,
        |              freq FROM v3))),
        |b3 AS (SELECT l, r FROM p3 GROUP BY l, r
        |       ORDER BY CAST(sum(freq) AS BIGINT) DESC, l, r LIMIT 1),
        |v4 AS (SELECT w, replace(enc, b.l || chr(1) || b.r || chr(1), b.l || b.r || chr(1)) AS enc,
        |       freq FROM v3, b3 b),
        |p4 AS (SELECT syms[i] AS l, syms[i+1] AS r, freq
        |  FROM (SELECT syms, freq, unnest(generate_series(1, len(syms) - 1)) AS i
        |        FROM (SELECT list_filter(string_split(enc, chr(1)), x -> x <> '') AS syms,
        |              freq FROM v4))),
        |b4 AS (SELECT l, r FROM p4 GROUP BY l, r
        |       ORDER BY CAST(sum(freq) AS BIGINT) DESC, l, r LIMIT 1),
        |v5 AS (SELECT w, replace(enc, b.l || chr(1) || b.r || chr(1), b.l || b.r || chr(1)) AS enc
        |       FROM v4, b4 b),
        |wt AS (SELECT w, CAST(len(list_filter(string_split(enc, chr(1)), x -> x <> '')) AS BIGINT)
        |       AS tok FROM v5),
        |dw AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS w FROM documents)
        |  GROUP BY doc_id, w)
        |SELECT CAST(dw.doc_id AS BIGINT) AS doc_id, CAST(sum(c) AS BIGINT) AS ws_tokens,
        |  CAST(sum(c * tok) AS BIGINT) AS bpe_tokens
        |FROM dw JOIN wt USING (w)
        |GROUP BY dw.doc_id ORDER BY doc_id""".stripMargin,
    // contamination replay: the gram set per doc (DISTINCT ≡ the engine's
    // Set-valued shingles, incl. the <n-word whole-text fallback), train
    // side reduced to DISTINCT grams before the join (fan-out 1 per gram)
    "ta_contamination" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i
        |        FROM w WHERE len(ws) >= 8)
        |  UNION
        |  SELECT doc_id, array_to_string(ws, ' ') AS g FROM w WHERE len(ws) < 8),
        |ev AS (SELECT * FROM grams WHERE doc_id % 20 = 0),
        |tr AS (SELECT DISTINCT g FROM grams WHERE doc_id % 20 <> 0)
        |SELECT ev.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        | CAST(coalesce(sum(CASE WHEN tr.g IS NULL THEN 0 ELSE 1 END), 0) AS BIGINT) AS n_overlap,
        | floor(CAST(coalesce(sum(CASE WHEN tr.g IS NULL THEN 0 ELSE 1 END), 0) AS DOUBLE)
        |   / count(*) * 10000 + 0.5) / 10000 AS overlap_ratio,
        | coalesce(sum(CASE WHEN tr.g IS NULL THEN 0 ELSE 1 END), 0) > 0 AS contaminated
        |FROM ev LEFT JOIN tr ON ev.g = tr.g
        |GROUP BY ev.doc_id ORDER BY ev.doc_id""".stripMargin,
    // PII scrub replay over the reassembled text spans (same string_agg
    // shape as cu_curation_funnel); DuckDB regexp_replace needs the 'g'
    // flag to match Spark's replace-all default
    "ex_pii_scrub" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    coalesce(string_agg(CASE WHEN kind = 'text' THEN text END, ' ' ORDER BY seq), '')
        |      AS text
        |  FROM read_parquet('__WAREHOUSE__/graft_extract_spans/*.parquet')
        |  GROUP BY doc_id)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(text, '\(\d{3}\) \d{3}-\d{4}')) AS BIGINT) AS n_phones,
        | md5(regexp_replace(regexp_replace(text,
        |     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |   '\(\d{3}\) \d{3}-\d{4}', '[PHONE]', 'g')) AS scrub_hash
        |FROM t ORDER BY doc_id""".stripMargin,
    "ta_quality_score" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        | CAST(len(regexp_extract_all(text,'\S+')) AS BIGINT) AS n_words,
        | floor(CASE WHEN len(regexp_extract_all(text,'\S+')) > 0
        |  THEN CAST(len(regexp_extract_all(lower(text),'\b(the|and|of|to|a|in|is)\b')) AS DOUBLE)
        |       / len(regexp_extract_all(text,'\S+')) ELSE 0 END * 10000 + 0.5) / 10000
        |  AS stopword_ratio,
        | floor(CASE WHEN length(text) > 0
        |  THEN CAST(len(regexp_extract_all(text,'[.,;:!?]')) AS DOUBLE) / length(text)
        |  ELSE 0 END * 10000 + 0.5) / 10000 AS punct_ratio,
        | floor(CASE WHEN len(regexp_extract_all(text,'\S+')) > 0
        |  THEN (CAST(length(text) AS DOUBLE) - (len(regexp_extract_all(text,'\S+')) - 1))
        |       / len(regexp_extract_all(text,'\S+')) ELSE 0 END * 10000 + 0.5) / 10000
        |  AS avg_word_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // FNV-1a64 over UTF-16 code units, re-expressed as a HUGEINT fold over
    // code points (generated corpus is BMP-only, so units == points);
    // pmod(h,16) == unsigned h % 16 because 2^64 ≡ 0 (mod 16)
    "cf_native_fnv" ->
      """WITH h AS (SELECT list_reduce(
        |    list_prepend(14695981039346656037::HUGEINT,
        |      [unicode(text[i])::HUGEINT for i in generate_series(1, length(text))]),
        |    (a, b) -> (xor(a, b) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |  ) % 16 AS bucket FROM documents)
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,
    // winnowing fingerprints: rolling 8-gram char FNV, signed-sorted
    // distinct, smallest 16 — the HUGEINT fold mirrors Java's wrapping
    // 64-bit arithmetic; signed view restored before the sort
    "ta_fingerprints" ->
      """WITH c AS (SELECT doc_id, text,
        |    [unicode(text[i])::HUGEINT for i in generate_series(1, length(text))] AS cs
        |  FROM documents),
        |f AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    CASE WHEN length(text) < 8 THEN
        |      [list_reduce(list_prepend(14695981039346656037::HUGEINT, cs),
        |        (a, b) -> (xor(a, b) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)]
        |    ELSE
        |      [list_reduce(list_prepend(14695981039346656037::HUGEINT, cs[i:i+7]),
        |        (a, b) -> (xor(a, b) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)
        |       for i in generate_series(1, length(text)-7)] END AS hs FROM c),
        |s AS (SELECT doc_id,
        |    list_sort(list_distinct([CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
        |      THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) for h in hs]))[1:16]
        |    AS sfps FROM f),
        |e AS (SELECT doc_id,
        |    unnest([{'idx': i - 1, 'fp': sfps[i]} for i in generate_series(1, len(sfps))]) AS u
        |  FROM s)
        |SELECT doc_id, CAST(u.idx AS BIGINT) AS idx, u.fp AS fp
        |FROM e ORDER BY doc_id, idx""".stripMargin,
    // FakeCodec.decode re-expressed byte-exactly: FNV-ish fold over the
    // first 16 UTF-8 bytes (via hex pairs), Java's abs(signed % m) becomes
    // the unsigned-branch CASE (2^64 ≡ 0 mod m doesn't hold for 1920, so
    // the negative branch is (2^64 - h) % m); Math.round == floor(x + 0.5)
    "mm_resize_plan" ->
      """WITH x AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |      ELSE 'video' END AS kind,
        |    substr(hex(encode(text)), 1, 32) AS hx FROM documents),
        |b AS (SELECT media_id, kind, CASE WHEN length(hx) = 0 THEN 0::HUGEINT
        |    ELSE list_reduce(
        |      list_prepend(1469598103934665603::HUGEINT,
        |        [((strpos('0123456789ABCDEF', hx[2*i-1])-1)*16
        |          + strpos('0123456789ABCDEF', hx[2*i])-1)::HUGEINT
        |         for i in generate_series(1, length(hx)//2)]),
        |      (a, c) -> (xor(a, c) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)
        |    END AS h
        |  FROM x WHERE kind IN ('image','video')),
        |wh AS (SELECT media_id, kind,
        |    CAST(CASE WHEN h < 9223372036854775808::HUGEINT
        |        THEN h % (CASE kind WHEN 'image' THEN 1920 ELSE 1280 END)
        |        ELSE (18446744073709551616::HUGEINT - h)
        |          % (CASE kind WHEN 'image' THEN 1920 ELSE 1280 END) END + 64 AS INT) AS width,
        |    CAST(CASE WHEN h < 9223372036854775808::HUGEINT
        |        THEN h % (CASE kind WHEN 'image' THEN 1080 ELSE 720 END)
        |        ELSE (18446744073709551616::HUGEINT - h)
        |          % (CASE kind WHEN 'image' THEN 1080 ELSE 720 END) END + 64 AS INT) AS height
        |  FROM b),
        |sc AS (SELECT *, least(1.0, 512.0 / greatest(width, height)) AS s FROM wh)
        |SELECT media_id, kind, width, height,
        |  CAST(greatest(1, floor(width * s + 0.5)) AS INT) AS out_w,
        |  CAST(greatest(1, floor(height * s + 0.5)) AS INT) AS out_h
        |FROM sc ORDER BY media_id""".stripMargin)
}
