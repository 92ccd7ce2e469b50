package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.connector.DagTopology
import graft.functions.{Envelope, Hl7, MappingSpec}
import graft.pipeline.Xf
import graft.sinks.CountingSink

/** §2.C ETL surface — the reference's identity re-expressed Spark-first:
  * JSONL parsing, record envelopes, HL7 segment parsing, declarative
  * mapping, DAG topologies, counting sink. See each library class for the
  * reference file:line mapping.
  */
object QueriesEtl {
  import Tables._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // json-reducer: parse JSON lines with a known schema (codegen'd from_json)
    "etl_jsonl" -> ((s, d) =>
      events(s, d).select(
        col("event_id"), col("event_type"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k"))),

    // wrap-record envelope, canonical byte-stable form
    "etl_envelope" -> ((s, d) =>
      events(s, d).select(
        col("event_id"),
        Envelope.canonicalJson(
          "record", unix_millis(col("ts")), "events",
          concat(lit("{\"event_id\":"), col("event_id").cast("string"),
                 lit(",\"event_type\":\""), col("event_type"), lit("\"}"))
        ).as("envelope"))),

    // HL7 build → segment split → field extraction round-trip
    "etl_hl7" -> ((s, d) => {
      val msg = concat(
        lit("MSH|^~\\&|GRAFT|"), col("o_orderkey").cast("string"), lit(Hl7.SegmentSep),
        lit("PID|1||"), col("o_custkey").cast("string"), lit("||"), col("o_orderstatus"), lit(Hl7.SegmentSep),
        lit("OBX|1|NM|PRICE||"),
        col("o_totalprice").cast("decimal(18,2)").cast("string"), lit("|USD"))
      val withSegs = Hl7.explodeSegments(
        orders(s, d).select(col("o_orderkey"), msg.as("msg")), col("msg"))
      withSegs.select(
        col("o_orderkey"), col("seg_idx"),
        Hl7.segmentId(col("seg")).as("seg_id"),
        size(Hl7.fields(col("seg"))).as("n_fields"),
        element_at(Hl7.fields(col("seg")), 4).as("f4"))
    }),

    // JUTE-analogue declarative mapping compiled to Catalyst expressions
    "etl_mapping" -> ((s, d) =>
      MappingSpec.parse(
        """# etlp-mapper analogue: template = data, compiled to exprs
          |id     = col: event_id
          |type_u = expr: UPPER(event_type)
          |k      = json: props $.k int
          |val_r  = expr: CAST(ROUND(value, 4) AS DOUBLE)
          |src    = lit: events
          |""".stripMargin)(events(s, d))),

    // full-depth JUTE analogue: nested struct output, $if conditional,
    // $let binding, $map loop — one YAML template compiled to a single
    // Catalyst expression tree (Jute.columns), vs the reference's
    // per-record interpreted jute.core/compile
    "etl_mapping_nested" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id") +: graft.functions.Jute.columns(
          """env:
            |  meta:
            |    lang: "$ lang"
            |    n_tokens: "$ CAST(size(split(text, ' ')) AS BIGINT)"
            |  id: "$ doc_id"
            |tag:
            |  $if: "lang = 'en'"
            |  $then: english
            |  $else: other
            |head_upper:
            |  $let:
            |    toks: "$ slice(split(text, ' '), 1, 3)"
            |  $body:
            |    $map: "$ toks"
            |    $as: t
            |    $body: "$ upper(t)"
            |""".stripMargin): _*)
        .select(col("doc_id"), to_json(col("env")).as("env_json"),
          col("tag"), concat_ws(" ", col("head_upper")).as("head_upper"))),

    // the JUTE long tail: $switch dispatch, $reduce fold, $defs/$call
    // template functions (inline-expanded) and $call of a SQL builtin —
    // the whole template still compiles to ONE Project over the scan
    "etl_mapping_full" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id") +: graft.functions.Jute.columns(
          """$defs:
            |  clip:
            |    $args: [s, n]
            |    $body: "$ substring(s, 1, n)"
            |lang_class:
            |  $switch: "$ lang"
            |  en: english
            |  es: spanish
            |  $default: other
            |tok_chars:
            |  $reduce: "$ split(text, ' ')"
            |  $acc: a
            |  $as: t
            |  $start: "$ CAST(0 AS BIGINT)"
            |  $body: "$ a + length(t)"
            |head12:
            |  $call: clip
            |  $args: ["$ text", "$ 12"]
            |upper_head:
            |  $call: upper
            |  $args:
            |    - $call: clip
            |      $args: ["$ text", "$ 5"]
            |""".stripMargin): _*)),

    // DAG topology: one source fans out to two branches, fan-in by union
    "etl_dag" -> ((s, d) =>
      DagTopology.empty
        .withSource("events", events(s, d))
        .withXform("clicks", Xf.filter(col("event_type") === "click") >> Xf(
          _.groupBy((col("user_id") % 10).cast("long").as("bucket"))
            .agg(count(lit(1)).cast("double").as("val"))
            .select(lit("clicks").as("branch"), col("bucket"), col("val"))))
        .withXform("purchases", Xf.filter(col("event_type") === "purchase") >> Xf(
          _.groupBy((col("user_id") % 10).cast("long").as("bucket"))
            .agg(expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)").as("val"))
            .select(lit("purchases").as("branch"), col("bucket"), col("val"))))
        .withXform("merged", Xf(identity))
        .withWorkflow("events" -> "clicks", "events" -> "purchases",
                      "clicks" -> "merged", "purchases" -> "merged")
        .output("merged")),

    // CSV connector round-trip through the correctness gate: write the
    // table as CSV, read it back via CsvSource, aggregate — the oracle
    // sees only the original table, so any roundtrip loss would fail it
    "etl_csv_roundtrip" -> ((s, d) => {
      val path = s"/tmp/graft_rt/csv_${d.replace('/', '_')}"
      val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      val src = Tables.lineitem(s, d).select(cols.head, cols.tail: _*)
      src.write.mode("overwrite").option("header", "true").csv(path)
      // explicit schema: inference would cost an extra full pass over
      // the written CSV (round-trip still proven — values re-parse)
      graft.sources.CsvSource(path, header = true,
        schema = Some(src.schema)).read(s)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
             expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"))
    }),

    // JSONL connector round-trip (json-reducer's format, both directions)
    "etl_jsonl_roundtrip" -> ((s, d) => {
      val path = s"/tmp/graft_rt/jsonl_${d.replace('/', '_')}"
      Tables.events(s, d)
        .select("event_id", "user_id", "event_type")
        .write.mode("overwrite").json(path)
      val schema = StructType(Seq(
        StructField("event_id", org.apache.spark.sql.types.LongType),
        StructField("user_id", org.apache.spark.sql.types.LongType),
        StructField("event_type", org.apache.spark.sql.types.StringType)))
      graft.sources.JsonlSource(path, Some(schema)).read(s)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             countDistinct(col("user_id")).as("n_users"))
    }),

    // fixed-width connector round-trip: the COBOL-copybook wire format
    // — orders formatted as padded columns, read back via
    // FixedWidthSource (SUBSTRING+TRIM+CAST, all scan-stage codegen),
    // aggregated; the oracle sees only the original parquet table
    "etl_fixedwidth_roundtrip" -> ((s, d) => {
      val path = s"/tmp/graft_rt/fw_${d.replace('/', '_')}"
      Tables.orders(s, d)
        .select(concat(
          expr("LPAD(CAST(o_orderkey AS STRING), 10, ' ')"),
          expr("RPAD(o_orderstatus, 4, ' ')"),
          expr("LPAD(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING), 15, ' ')"),
          expr("RPAD(o_orderpriority, 16, ' ')")).as("value"))
        .write.mode("overwrite").text(path)
      graft.sources.FixedWidthSource(path, Seq(
          ("o_orderkey", 1, 10, "BIGINT"),
          ("o_orderstatus", 11, 4, "STRING"),
          ("o_totalprice", 15, 15, "DECIMAL(18,2)"),
          ("o_orderpriority", 30, 16, "STRING")))
        .read(s)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE)").as("sum_price"))
    }),

    // ORC connector round-trip: the second columnar lake format (Hive
    // estates) — write, read back via OrcSource, aggregate; the oracle
    // sees only the original parquet table, so any type/value drift
    // through the ORC writer/vectorized reader fails the hash
    "etl_orc_roundtrip" -> ((s, d) => {
      val path = s"/tmp/graft_rt/orc_${d.replace('/', '_')}"
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
        .write.mode("overwrite").orc(path)
      graft.sources.OrcSource(path).read(s)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
             expr("CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)").as("sum_price"))
    }),

    // small-file compaction: fragment orders into 40 tiny part files,
    // compact to byte-sized targets, aggregate the COMPACTED output —
    // the oracle sees only the original table, so any row lost or
    // duplicated in the rewrite fails the hash; the file-count drop
    // itself is spec-asserted (SourcesSinksSpec)
    "etl_compact" -> ((s, d) => {
      val frag = s"/tmp/graft_rt/compact_in_${d.replace('/', '_')}"
      val outp = s"/tmp/graft_rt/compact_out_${d.replace('/', '_')}"
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .repartition(40).write.mode("overwrite").parquet(frag)
      graft.operators.Compaction.compact(s, frag, outp,
          targetFileBytes = 8L << 20)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
             expr("CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)").as("sum_price"))
    }),

    // Avro connector round-trip: standard object-container files via
    // the avro core lib (no spark-avro module on this classpath) —
    // write per-partition containers, read back via streaming decode,
    // aggregate; exercises long/string/double/date through the Avro
    // type mapping. Oracle sees only the original parquet table.
    "etl_avro_roundtrip" -> ((s, d) => {
      val path = s"/tmp/graft_rt/avro_${d.replace('/', '_')}"
      val src = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate")
      graft.sources.AvroSink(path).write(src)
      graft.sources.AvroSource(path).read(s)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
             expr("CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)").as("sum_price"),
             date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("max_date"))
    }),

    // XML round-trip through Spark 4's BUILT-IN xml source: write one
    // rowTag element per order, read back through the explicit-schema
    // production path (single parse pass — inference costs a second
    // full read and is covered by SourcesSinksSpec), aggregate — the
    // oracle sees only the original table, so any parse loss fails
    "etl_xml_roundtrip" -> ((s, d) => {
      val path = s"/tmp/graft_rt/xml_${d.replace('/', '_')}"
      val src = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority")
      graft.sources.XmlSink(path, rowTag = "order").write(src)
      graft.sources.XmlSource(path, rowTag = "order",
          schema = Some(src.schema)).read(s)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)")
            .as("sum_price"),
          max(col("o_orderpriority")).as("max_pri"))
        .select(col("o_orderstatus").cast("string").as("o_orderstatus"),
          col("n"), col("sum_price"), col("max_pri"))
    }),

    // error-channel split: rows whose parse attempt fails flow to an
    // error side-output as wrap-error envelopes; both sides re-unioned
    // here (tagged) so one oracle checks the whole routing
    "etl_error_channel" -> ((s, d) => {
      val sp = graft.functions.ErrorChannel.split(
        events(s, d),
        // "parse": value must floor to a strictly positive int (FLOOR,
        // not CAST — duckdb CAST(double AS INT) rounds, Spark truncates)
        attempt = expr("CASE WHEN CAST(FLOOR(value) AS INT) > 0 THEN CAST(FLOOR(value) AS INT) END"),
        resultName = "parsed",
        ok = Seq(col("event_id")),
        timestampMs = unix_millis(col("ts")),
        sourceStream = "events",
        errJson = concat(lit("{\"event_id\":"), col("event_id").cast("string"),
          lit("}")))
      sp.ok.select(lit("record").as("channel"),
          col("event_id"), col("parsed"), lit(null.asInstanceOf[String]).as("envelope"))
        .unionByName(sp.errors.select(lit("error").as("channel"),
          lit(null.asInstanceOf[java.lang.Long]).as("event_id"),
          lit(null.asInstanceOf[java.lang.Integer]).as("parsed"), col("envelope")))
    }),

    // processor registry through the correctness gate: assemble an app
    // from two named processors (etlp.core/init analogue), dispatch
    // check + start commands by name, emit the ExecResults — the start
    // counts must equal the oracle's direct filters over events
    "etl_registry" -> ((s, d) => {
      import graft.connector.{Connection, EtlpApp, ProcessorDef}
      import graft.sources.FnSource
      val src =
        FnSource(Map("type" -> "table", "table" -> "events"), events(_, d))
      val app = EtlpApp.init(Seq(
        ProcessorDef("p_clicks", _ => Connection(
          src, Xf.filter(col("event_type") === "click"), CountingSink())),
        ProcessorDef("p_purchases", opts => Connection(
          src,
          Xf.filter(col("event_type") === "purchase" &&
            col("value") >= opts.getOrElse("min_value", "0").toDouble),
          CountingSink()))))
      val rows = Seq(
        app.exec(s, "p_clicks", "check"),
        app.exec(s, "p_clicks", "start"),
        app.exec(s, "p_purchases", "check"),
        app.exec(s, "p_purchases", "start", Map("min_value" -> "0.5")))
      import s.implicits._
      rows.map(r => (r.processor, r.command, r.ok, r.records))
        .toDF("processor", "command", "ok", "n_records")
    }),

    // stdout-destination analogue: count records in batches of 100
    "etl_count_sink" -> ((s, d) => {
      val (records, batches) = CountingSink(batchSize = 100)
        .writeAndCount(events(s, d).where(col("event_type") === "click"))
      import s.implicits._
      Seq((records, batches)).toDF("records", "batches")
    }),

    // upsert compaction: current-state view of the append-only events
    // changelog — latest record per (user_id, event_type), one
    // key-partitioned window with map-side WindowGroupLimit pruning
    "etl_upsert" -> ((s, d) =>
      graft.operators.Changelog.latestByKey(
        events(s, d), Seq("user_id", "event_type"),
        Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"), expr("CAST(ROUND(value, 4) AS DOUBLE)").as("val_r"))),

    // CDC apply with tombstones: the latest event per user decides the
    // user's materialized state; users whose latest event is an 'error'
    // tombstone drop out (a later event would resurrect them)
    "etl_cdc_apply" -> ((s, d) =>
      graft.operators.Changelog.applyCdc(
        events(s, d), Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc),
        isDelete = col("event_type") === "error")
        .select("user_id", "event_id", "event_type", "ts")),

    // SCD type-2: purchase history per user as validity intervals
    // (version, valid_from, valid_to, is_current)
    "etl_scd2" -> ((s, d) =>
      graft.operators.Changelog.scd2(
        events(s, d).where(col("event_type") === "purchase"),
        Seq("user_id"), "ts", Seq(col("event_id").asc))
        .select(col("user_id"), col("version"), col("event_id"),
          col("valid_from"), col("valid_to"), col("is_current"))),

    // bitemporal as-of over an append-only assertion ledger derived
    // from orders (a reprice valid 180 days on for key%5, a retroactive
    // correction recorded later for key%7): the same valid-time
    // snapshot reconstructed at two transaction times — the pre-
    // correction read is REPRODUCIBLE forever, the post-correction one
    // sees the fix. Two nested map-side-combining argmax aggregates.
    "etl_bitemporal" -> ((s, d) => {
      val o = orders(s, d)
      val base = o.select(col("o_orderkey").as("order_key"),
        col("o_orderdate").as("valid_from"),
        expr("TIMESTAMP '1998-01-01 00:00:00'").as("tx_from"),
        col("o_totalprice").cast("double").as("price"))
      val reprice = o.where(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey").as("order_key"),
          expr("o_orderdate + INTERVAL 180 DAYS").as("valid_from"),
          expr("TIMESTAMP '1998-01-01 00:00:00'").as("tx_from"),
          expr("CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.9 AS DECIMAL(2,1)), 2) AS DOUBLE)")
            .as("price"))
      val correction = o.where(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("order_key"),
          col("o_orderdate").as("valid_from"),
          expr("TIMESTAMP '1998-06-01 00:00:00'").as("tx_from"),
          expr("CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)")
            .as("price"))
      val ledger = base.unionByName(reprice).unionByName(correction)
      def snap(tag: String) =
        graft.operators.Changelog.bitemporalAsOf(ledger, Seq("order_key"),
            "valid_from", "tx_from",
            expr("TIMESTAMP '1996-01-01 00:00:00'"),
            expr(s"TIMESTAMP '$tag'"))
          .withColumn("as_of_tx", lit(tag))
      snap("1998-03-01 00:00:00").unionByName(snap("1998-12-31 00:00:00"))
        .select(col("order_key"), col("as_of_tx"), col("valid_from"),
          col("tx_from"), col("price"))
    }),

    // deterministic pseudonymization: customer/order keys replaced by
    // salted-md5 pseudonyms on BOTH tables — the join still lines up
    // (referential integrity survives), and the per-segment pseudonym
    // min pins the actual mapped values against the oracle
    "etl_pseudonymize" -> ((s, d) => {
      val pc = graft.operators.Keys.pseudonymize(
        customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
        Seq("c_custkey"), salt = "r7")
      val po = graft.operators.Keys.pseudonymize(
        orders(s, d).select(col("o_custkey"), col("o_totalprice")),
        Seq("o_custkey"), salt = "r7")
      pc.join(po, col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(countDistinct(col("c_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"),
          min(col("c_custkey")).as("min_pid"),
          expr("CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)")
            .as("sum_price"))
    }),

    // ε-DP count release: per-priority order counts + deterministic
    // seeded Laplace noise (reproducible, auditable releases; the true
    // count never appears in the output)
    "etl_dp_counts" -> ((s, d) =>
      graft.operators.Quality.dpCounts(orders(s, d), "o_orderpriority",
        epsilon = 1.0, salt = "r7")),

    // point-in-time dimension lookup: each click joined to the SCD2
    // purchase version valid at its timestamp — the classic warehouse
    // temporal join, run as a backward AS-OF on version starts
    // (union+window, ONE shuffle by user; never fact × history pairs)
    "etl_scd2_lookup" -> ((s, d) => {
      val ev = events(s, d)
      val dim = graft.operators.Changelog.scd2(
          ev.where(col("event_type") === "purchase"),
          Seq("user_id"), "ts", Seq(col("event_id").asc))
        .select(col("user_id").as("dim_user"), col("version"),
          col("event_id").as("purchase_id"), col("valid_from"))
      val facts = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      graft.operators.AsOf.join(facts, dim, "user_id", "dim_user",
          "ts", "valid_from", Seq("version", "purchase_id"),
          tieBreak = "version")
        .select(col("click_id"), col("user_id"), col("version"),
          col("purchase_id"))
    }),

    // data-quality profile card: per-column rows/nulls/exact-distinct/
    // min/max in one aggregate pass (Expand + two-phase agg, one shuffle)
    "etl_profile" -> ((s, d) =>
      graft.operators.Profile.columnProfile(
        orders(s, d),
        Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"))),

    // declarative expectations suite: per-rule violation counts in ONE
    // aggregate pass (all rules codegen'd into the same scan stage)
    "etl_dq_rules" -> ((s, d) =>
      graft.operators.Quality.checkRules(lineitem(s, d), Seq(
        "qty_positive" -> "l_quantity > 0",
        "qty_max_45" -> "l_quantity <= 45",
        "price_positive" -> "l_extendedprice > 0",
        "flag_domain" -> "l_returnflag IN ('A','N','R')",
        "ship_after_1992" -> "l_shipdate >= TIMESTAMP '1992-01-01 00:00:00'"))),

    // calendar dimension spanning the fact table's observed range: one
    // 1-row min/max aggregate explodes to the day spine with portable
    // attributes (ISO dow, no locale names, no ISO week)
    "etl_date_dim" -> ((s, d) =>
      graft.operators.Keys.dateDim(orders(s, d), "o_orderdate")),

    // row-level QUARANTINE: the rows etl_dq_rules only counts, each
    // with WHY (violated rule names in definition order) — the triage
    // channel a pipeline routes while clean rows continue; scan-stage
    "etl_quarantine" -> ((s, d) =>
      graft.operators.Quality.quarantine(lineitem(s, d),
        Seq("l_orderkey", "l_linenumber"), Seq(
          "qty_max_45" -> "l_quantity <= 45",
          "discount_le_05" -> "l_discount <= 0.05",
          "flag_domain" -> "l_returnflag IN ('A','N','R')",
          "ship_after_1992" -> "l_shipdate >= TIMESTAMP '1992-01-01 00:00:00'"))),

    // entity resolution: blocked pairwise fuzzy match (Levenshtein ≤ 2).
    // The block key includes a name prefix (all but the last 2 chars) —
    // the "zip+surname-prefix" shape whose CARDINALITY GROWS with the
    // data, keeping Σ|block|² linear; nation+segment alone is a fixed
    // 125-block key whose in-block quadratic returns at scale (measured:
    // 0.3s → 5.0s across one 10× step). Prefix blocking trades recall
    // for that bound (a pair differing inside the prefix is never
    // compared) — the standard ER contract, mirrored by the oracle.
    "er_match" -> ((s, d) =>
      graft.operators.Er.fuzzyMatchPairs(
        Tables.customer(s, d).withColumn("name_blk",
          expr("substring(c_name, 1, length(c_name) - 2)")),
        "c_custkey", "c_name",
        Seq("c_nationkey", "c_mktsegment", "name_blk"),
        maxDistance = 2)),

    // partition-level TTL retention: stage events day-partitioned,
    // drop every day before the cutoff WITHOUT opening a data file
    // (directory-listing delete), read back the survivors
    "etl_ttl" -> ((s, d) => {
      val root = s"/tmp/graft_rt/ttl_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      Tables.events(s, d)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .write.partitionBy("day").parquet(root)
      graft.operators.Retention.ttlSweep(s, root, "day", "2024-01-10")
      s.read.parquet(root)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("day"),
          expr("CAST(ROUND(value, 4) AS DOUBLE)").as("val_r"))
    }),

    // PSI drift monitor: early orders are the baseline distribution,
    // later orders (with a deliberate price shift on a slice) the
    // current load — per-bin terms + the exact-decimal total
    "etl_drift" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val base = o.where(col("o_orderkey") % 3 === 0)
      val cur = o.where(col("o_orderkey") % 3 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 1.5)
            .otherwise(col("o_totalprice")))
      graft.operators.Profile.psiDrift(base, cur, "o_totalprice", bins = 10)
    }),

    // right-to-be-forgotten sweep: stage customers into a 16-bucket
    // keyed store, erase every custkey ≡ 3 (mod 10) by rewriting ONLY
    // the touched bucket dirs, read back the surviving store
    "etl_forget" -> ((s, d) => {
      val root = s"/tmp/graft_rt/forget_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val c = Tables.customer(s, d)
      graft.sinks.PartitionOverwriteSink(root, Seq("graft_kb"))
        .write(c.withColumn("graft_kb",
          pmod(xxhash64(col("c_custkey")), lit(16))))
      graft.operators.Retention.forgetKeys(s, root, Seq("c_custkey"),
        c.where(col("c_custkey") % 10 === 3).select("c_custkey"))
      s.read.parquet(root).drop("graft_kb")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))
    }),

    // k-anonymity release gate: detail QI = (nation, segment, acctbal
    // band/1100), coarse = (region, segment, band/4400), k=12 — class
    // sizes from two GROUP BYs over the bounded QI domain broadcast
    // back onto the fact; no window over low-cardinality partitions
    "etl_kanon" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("n_name"), col("r_name"),
          col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") / 1100).cast("long").as("bd"),
          floor(col("c_acctbal") / 4400).cast("long").as("bc"))
      graft.operators.Quality.kAnonymize(base, Seq("n_name", "seg", "bd"),
          Seq("r_name", "seg", "bc"), k = 12)
        .select(col("c_custkey"), col("anon_level"), col("qi_out"))
    }),

    // l-diversity audit over a k-anonymized release (QI excludes the
    // sensitive segment here, unlike etl_kanon's): per equivalence
    // class, distinct sensitive values vs the l=3 bar — the attribute-
    // disclosure check k-anonymity alone cannot give
    "etl_ldiversity" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("n_name"), col("r_name"),
          col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") / 1100).cast("long").as("bd"),
          floor(col("c_acctbal") / 4400).cast("long").as("bc"))
      val rel = graft.operators.Quality.kAnonymize(base,
          Seq("n_name", "bd"), Seq("r_name", "bc"), k = 12)
        .select(col("seg"), col("anon_level"), col("qi_out"))
      graft.operators.Quality.lDiversity(rel,
        Seq("anon_level", "qi_out"), "seg", l = 3)
    }),

    // ER end-to-end: match pairs → CC clusters (chains a~b~c become
    // ONE entity) → golden record per cluster — canonical member is
    // the min id (== cluster_id by CC construction), survivorship =
    // max balance across members
    "er_cluster" -> ((s, d) => {
      val c = Tables.customer(s, d).withColumn("name_blk",
        expr("substring(c_name, 1, length(c_name) - 2)"))
      val pairs = graft.operators.Er.fuzzyMatchPairs(c, "c_custkey",
        "c_name", Seq("c_nationkey", "c_mktsegment", "name_blk"),
        maxDistance = 2)
      graft.operators.Er.clusterIds(c, "c_custkey", pairs, "id_a", "id_b")
        .join(c, col("id") === col("c_custkey"))
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"),
          max(when(col("id") === col("cluster_id"), col("c_name")))
            .as("canonical_name"),
          expr("CAST(ROUND(CAST(MAX(c_acctbal) AS DOUBLE), 2) AS DOUBLE)")
            .as("max_acctbal"))
    }),

    // golden-record construction (MDM survivorship): per entity
    // cluster, field-level rules — modal segment (count desc, value
    // asc tie), cleanest name (shortest, then lexicographic), richest
    // balance, min id as the stable golden key. Cluster-keyed windows
    // + one aggregate; nothing crosses clusters.
    "er_golden" -> ((s, d) => {
      val c = Tables.customer(s, d).withColumn("name_blk",
        expr("substring(c_name, 1, length(c_name) - 2)"))
      val pairs = graft.operators.Er.fuzzyMatchPairs(c, "c_custkey",
        "c_name", Seq("c_nationkey", "c_mktsegment", "name_blk"),
        maxDistance = 2)
      val mem = graft.operators.Er.clusterIds(c, "c_custkey", pairs,
          "id_a", "id_b")
        .join(c, col("id") === col("c_custkey"))
      graft.operators.Er.goldenRecords(mem, "cluster_id", "id",
        "c_name", "c_mktsegment", "c_acctbal")
    }),

    // snapshot reconciliation: one full-outer keyed join reports every
    // added / removed / changed key between two loads; output is
    // proportional to churn, not table size
    "etl_diff" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val oldSnap = o.where(col("o_orderkey") % 50 =!= 1)
      val newSnap = o.where(col("o_orderkey") % 50 =!= 2)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 50 === 3, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 50 === 3, lit("X"))
            .otherwise(col("o_orderstatus")))
      graft.operators.Reconcile.diff(oldSnap, newSnap, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice", "o_orderpriority"))
    }),

    // incremental aggregate maintenance: fold a new batch's partials
    // into stored per-key state without rescanning history; exact
    // because every measure is a monoid over decimal/min/max
    "etl_incr_agg" -> ((s, d) => {
      import graft.operators.IncrementalAgg
      val ev = events(s, d)
      val cut = expr("TIMESTAMP '2024-01-20 00:00:00'")
      val state = IncrementalAgg.partials(
        ev.where(col("ts") < cut), Seq("event_type"), "value")
      val delta = IncrementalAgg.partials(
        ev.where(col("ts") >= cut), Seq("event_type"), "value")
      IncrementalAgg.finish(
        IncrementalAgg.merge(Seq(state, delta), Seq("event_type")),
        Seq("event_type"))
    }),

    // schema evolution: two parquet drops written under different
    // schema versions (v2 adds o_totalprice), read back as ONE dataset
    // via mergeSchema — v1 rows surface the new column as NULL; the
    // oracle sees only the original table, so the merged read must
    // reconstruct exactly the original values and null pattern
    "etl_schema_evolve" -> ((s, d) => {
      val path = s"/tmp/graft_rt/evolve_${d.replace('/', '_')}"
      val o = Tables.orders(s, d)
      o.where(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_custkey")
        .write.mode("overwrite").parquet(s"$path/v1")
      o.where(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$path/v2")
      graft.sources.ParquetSource(s"$path/*", mergeSchema = true).read(s)
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_totalprice")).as("n_price"),
          expr("CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)")
            .as("sum_price"))
    }),

    // dynamic partition overwrite — the daily-recompute write pattern:
    // seed the partitioned table (static overwrite), then MERGE one
    // partition's recomputed rows through PartitionOverwriteSink; every
    // other partition's files must survive untouched, so the read-back
    // equals "orders with one priority's prices doubled" (which is what
    // the oracle recomputes from scratch)
    "etl_partition_overwrite" -> ((s, d) => {
      val root = s"/tmp/graft_rt/popw_${d.replace('/', '_')}"
      val base = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
      graft.sinks.ParquetSink(root,
        partitionBy = Seq("o_orderpriority")).write(base)
      val patch = Tables.orders(s, d)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"),
          (col("o_totalprice") * 2).as("o_totalprice"),
          col("o_orderpriority"))
      graft.sinks.PartitionOverwriteSink(root,
        partitionBy = Seq("o_orderpriority")).write(patch)
      s.read.parquet(root)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority").cast("string").as("o_orderpriority"))
    }),

    // the C-group MACRO-gate (q_pipeline's ETL sibling): land → quality
    // split → fan-OUT to a per-rule quarantine report AND the clean
    // branch's aggregate, which publishes ATOMICALLY through the Txn
    // manifest and reads back FROM THE PUBLISHED SNAPSHOT — then fan-in
    // by union. One DagTopology, both branches sharing the single
    // violationArray expression (verdicts cannot drift), the read-back
    // making the commit itself load-bearing in the correctness gate
    "etl_pipeline" -> ((s, d) => {
      val rules = Seq(
        "qty_max_45" -> "l_quantity <= 45",
        "discount_le_05" -> "l_discount <= 0.05",
        "flag_domain" -> "l_returnflag IN ('A','N','R')",
        "ship_after_1992" -> "l_shipdate >= TIMESTAMP '1992-01-01 00:00:00'")
      val split = Xf(_.withColumn("__fr",
        graft.operators.Quality.violationArray(rules)))
      val quar = Xf(df => {
        // checkRules' wide-aggregate shape so ZERO-violation rules
        // still report (an exploded group-count would drop them)
        val aggs = rules.map { case (name, _) =>
          sum(when(array_contains(col("__fr"), name), 1L).otherwise(0L))
            .as(s"__q_$name")
        }
        df.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(rules.map { case (name, _) => struct(
            lit(name).as("key"), col(s"__q_$name").as("n"))
          }: _*)).as("r"))
          .select(lit("quarantine").as("branch"), col("r.key").as("key"),
            col("r.n").as("n"), lit(null).cast("double").as("amount"))
      })
      val publish = Xf(df => {
        val root = s"/tmp/graft_rt/etlpipe_${d.replace('/', '_')}"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
        val clean = df.where(size(col("__fr")) === 0)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            expr("""CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1.0 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)""")
              .as("amount"))
        graft.operators.Txn.commitOverwrite(s, root, clean)
        graft.operators.Txn.read(s, root)
          .select(lit("published").as("branch"),
            col("l_returnflag").as("key"), col("n"), col("amount"))
      })
      DagTopology.empty
        .withSource("land", lineitem(s, d))
        .withXform("split", split)
        .withXform("quarantine_report", quar)
        .withXform("published", publish)
        .withXform("report", Xf(identity))
        .withWorkflow("land" -> "split",
          "split" -> "quarantine_report", "split" -> "published",
          "quarantine_report" -> "report", "published" -> "report")
        .output("report")
    }),

    // ATOMIC manifest commit (r9 verdict #6): the table's state is
    // defined solely by the highest atomically-renamed manifest, so a
    // reader mid-publish sees the old snapshot fully or the new one
    // fully — never a torn directory. The gate pins BOTH snapshots:
    // v1 (half the users) must stay byte-stable through v2's partition
    // overwrite (time travel at the file layer), and latest must equal
    // a from-scratch recompute of the post-commit state
    "etl_txn_commit" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txn_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
      val v1 = ev.where(col("user_id") % 2 === 0)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val ver1 = graft.operators.Txn.commitOverwrite(
        s, root, v1, Seq("event_type"))
      val patch = ev.where(col("event_type").isin("click", "view"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      graft.operators.Txn.commitReplacePartitions(
        s, root, patch, "event_type")
      graft.operators.Txn.read(s, root, Some(ver1))
        .select(lit("v1").as("snapshot"),
          col("event_type").cast("string").as("event_type"), col("n"))
        .unionByName(graft.operators.Txn.read(s, root)
          .select(lit("latest").as("snapshot"),
            col("event_type").cast("string").as("event_type"), col("n")))
    }),

    // INCREMENTAL CHANGE READ: a consumer that processed v1 reads
    // EXACTLY the rows v2 added (file-set difference over the
    // manifests — never a table rescan); the gate emits the v1
    // snapshot AND the v1→v2 delta, so both the baseline and the
    // increment are hash-pinned
    "etl_txn_changes" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txnch_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
      val v1 = graft.operators.Txn.commitOverwrite(s, root,
        ev.where(col("user_id") % 2 === 0))
      graft.operators.Txn.commitAppend(s, root,
        ev.where(col("user_id") % 2 === 1))
      def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
              .as("sum_val"))
          .select(lit(tag).as("slice"), col("event_type"), col("n"),
            col("sum_val"))
      agg(graft.operators.Txn.read(s, root, Some(v1)), "base")
        .unionByName(
          agg(graft.operators.Txn.readChanges(s, root, v1), "delta"))
    }),

    // TABLE COMPACTION at the manifest layer: two commits accrete
    // fragmented files, compact() rewrites the head as one fresh
    // ATOMIC commit (2 files, stats re-recorded) — readers mid-fold
    // see the old head, every prior version stays time-travelable
    // (file-count drop + history pinned in TxnSpec), and the result
    // equals the from-scratch recompute
    "etl_txn_compact" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txncp_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
      graft.operators.Txn.commitOverwrite(s, root,
        ev.where(col("user_id") % 2 === 0).repartitionByRange(6,
          col("user_id")), statsCol = Some("user_id"))
      graft.operators.Txn.commitAppend(s, root,
        ev.where(col("user_id") % 2 === 1).repartitionByRange(6,
          col("user_id")), statsCol = Some("user_id"))
      graft.operators.Txn.compact(s, root, numFiles = 2,
        statsCol = Some("user_id"))
      // skip-scan THROUGH the compacted layout: stats were re-recorded
      graft.operators.Txn.readWhere(s, root, "user_id", 0d, 1e9)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
    }),

    // COPY-ON-WRITE row-level DELETE through the manifest (the GDPR
    // forget flow at the lakehouse layer): stats-pruned rewrite of
    // ONLY the files that can hold a forgotten key, one atomic commit.
    // The gate pins BOTH sides of the contract: the head equals a
    // recompute from the filtered source, and the pre-delete snapshot
    // stays time-travelable (physical erasure = delete + vacuum, the
    // Delta/Iceberg retention boundary; untouched-files-byte-identical
    // is pinned in TxnSpec)
    "etl_txn_forget" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txnfg_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
      // blooms ride the stats pass (r14): a buggy bloom that false-
      // negatives a candidate file surfaces here as missed deletes —
      // the oracle is the complement filter, so the gate hash-fails
      graft.operators.Txn.commitOverwrite(s, root,
        ev.repartitionByRange(8, col("user_id")),
        statsCol = Some("user_id"), bloomCols = Seq("user_id"))
      val forget = ev.where(col("user_id") % 10 === 3)
        .select("user_id").distinct()
      graft.operators.Txn.commitDelete(s, root, forget, "user_id",
        statsCol = Some("user_id"), bloomCols = Seq("user_id"))
      def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
              .as("sum_val"))
          .select(lit(tag).as("slice"), col("event_type"), col("n"),
            col("sum_val"))
      agg(graft.operators.Txn.read(s, root), "head")
        .unionByName(agg(graft.operators.Txn.read(s, root, Some(1)), "pre"))
    }),

    // MERGE-ON-READ delete via DELETION VECTORS (r16) — one semantics,
    // second mechanism: same forget flow as etl_txn_forget (shared
    // oracle verbatim), but the delete commit rewrites ZERO data files
    // (TxnSpec pins that) — it publishes the forgotten keys as a small
    // sidecar and annotates only the bloom-candidate files' manifest
    // lines; every read anti-masks. At 100 TB this turns a scattered
    // GDPR delete from rewrite-amplified copy-on-write into
    // O(deleted keys) + one manifest commit
    "etl_txn_forget_dv" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txnfgdv_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
      graft.operators.Txn.commitOverwrite(s, root,
        ev.repartitionByRange(8, col("user_id")),
        statsCol = Some("user_id"), bloomCols = Seq("user_id"))
      val forget = ev.where(col("user_id") % 10 === 3)
        .select("user_id").distinct()
      graft.operators.Txn.commitDeleteDv(s, root, forget, "user_id")
      def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
              .as("sum_val"))
          .select(lit(tag).as("slice"), col("event_type"), col("n"),
            col("sum_val"))
      agg(graft.operators.Txn.read(s, root), "head")
        .unionByName(agg(graft.operators.Txn.read(s, root, Some(1)), "pre"))
    }),

    // POINT-KEY snapshot read (Txn.readKeys — the GDPR "show me this
    // user's rows" / serving-path lookup): commit an INTERLEAVED
    // layout (user_id % 8 per file, so every file's [min,max] spans
    // the whole domain and range stats alone prune NOTHING), record
    // blooms, then read a scattered key set — candidates come from
    // the bloom probe, the exact semi-join keeps the result
    // layout-independent, and the oracle is the plain IN filter. A
    // bloom false-negative (skipping a file that holds a key) shows
    // up as missing rows and hash-fails
    "etl_txn_pointread" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txnpr_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
      graft.operators.Txn.commitOverwrite(s, root,
        ev.repartitionByRange(8, col("user_id") % 8),
        statsCol = Some("user_id"), bloomCols = Seq("user_id"))
      val keys = ev.where(col("user_id") % 97 === 5)
        .select("user_id").distinct()
      graft.operators.Txn.readKeys(s, root, keys, "user_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
    }),

    // STRING-RANGE skip-scan (r15): the date-string slice — the
    // dominant selective predicate on real time-keyed tables is a
    // VARCHAR day/month key, which the double-cast stats surface
    // cannot serve. Commit a day-range-partitioned layout with string
    // min/max recorded, then read a 10-day slice through
    // readWhereStr: only files whose recorded UTF8-order [min,max]
    // intersects the slice are opened (TxnSpec pins the file count);
    // the residual predicate keeps the result exact however files
    // overlap, and the oracle recomputes the slice from raw ts
    "etl_txn_skipscan_str" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txnsks_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d).select(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("value"))
      graft.operators.Txn.commitOverwrite(s, root,
        ev.repartitionByRange(8, col("day")), statsCol = Some("day"))
      graft.operators.Txn.readWhereStr(s, root, "day",
          "2024-01-10", "2024-01-19")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
    }),

    // PARTITION-SCOPED compaction (r15 — Delta's OPTIMIZE WHERE): a
    // hot partition accretes small files across three fragmented
    // partitioned commits; compactWhere folds ONLY that partition
    // (other partitions' manifest lines carry verbatim — TxnSpec pins
    // the byte-identity and the file-count collapse) as one atomic
    // commit. The head read must equal the plain recompute: a fold
    // that loses, duplicates, or cross-contaminates partitions
    // hash-fails
    "etl_txn_compact_where" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txncw_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
      graft.operators.Txn.commitOverwrite(s, root,
        ev.where(col("user_id") % 3 === 0).repartition(4),
        partitionBy = Seq("event_type"), statsCol = Some("user_id"))
      graft.operators.Txn.commitAppend(s, root,
        ev.where(col("user_id") % 3 === 1).repartition(4),
        partitionBy = Seq("event_type"), statsCol = Some("user_id"))
      graft.operators.Txn.commitAppend(s, root,
        ev.where(col("user_id") % 3 === 2).repartition(4),
        partitionBy = Seq("event_type"), statsCol = Some("user_id"))
      val hot = ev.select("event_type").distinct()
        .orderBy("event_type").head().getString(0)
      graft.operators.Txn.compactWhere(s, root, "event_type", Seq(hot),
        statsCol = Some("user_id"))
      graft.operators.Txn.read(s, root)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
    }),

    // STRING-KEYED point pruning (r15) — the realistic GDPR shape:
    // uids are strings ("u-<id>"), which TRY_CAST sends to NULL, so
    // the r14 double-only stats surface recorded nothing and (worse)
    // the write path's all-zero bloom made commitDelete silently KEEP
    // every row (r14 advice). Same interleaved layout as
    // etl_txn_pointread (string [min,max] spans the domain → the raw-
    // UTF8 bloom is load-bearing): a string-keyed delete lands first
    // (any surviving %10==3 row hash-fails the gate), then the point
    // read opens only bloom candidates + the exact semi-join
    "etl_txn_pointread_str" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txnprs_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d).select(
        concat(lit("u-"), col("user_id").cast("string")).as("uid"),
        col("event_type"), col("value"), col("user_id"))
      graft.operators.Txn.commitOverwrite(s, root,
        ev.repartitionByRange(8, col("user_id") % 8).drop("user_id"),
        statsCol = Some("uid"), bloomCols = Seq("uid"))
      val forget = ev.where(col("user_id") % 10 === 3)
        .select("uid").distinct()
      graft.operators.Txn.commitDelete(s, root, forget, "uid",
        statsCol = Some("uid"), bloomCols = Seq("uid"))
      val keys = ev.where(col("user_id") % 97 === 5)
        .select("uid").distinct()
      graft.operators.Txn.readKeys(s, root, keys, "uid")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
    }),

    // CHANGE DATA FEED across rewrite commits: readChangesCdf derives
    // insert/delete rows per commit from manifest file-set deltas —
    // the consumer contract plain readChanges documents away (a
    // compaction repeats rows file-additively; CDF emits the
    // self-cancelling delete+insert instead). History here interleaves
    // append → compact → copy-on-write delete; every (change, commit)
    // slice is recomputed by the oracle from the source table, so the
    // per-commit multisets themselves are hash-pinned
    "etl_txn_cdf" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txncdf_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
      graft.operators.Txn.commitOverwrite(s, root,
        ev.where(col("user_id") % 2 === 0))                        // v1
      graft.operators.Txn.commitAppend(s, root,
        ev.where(col("user_id") % 2 === 1))                        // v2
      graft.operators.Txn.compact(s, root, numFiles = 2)           // v3
      // no statsCol: every file rewrites, so the delete/insert
      // multisets are layout-independent (deterministic for the gate)
      graft.operators.Txn.commitDelete(s, root,
        ev.where(col("user_id") % 10 === 3).select("user_id").distinct(),
        "user_id")                                                 // v4
      graft.operators.Txn.readChangesCdf(s, root, 1)
        .groupBy(col("_change_type").as("change"),
          col("_commit_version").as("v"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
    }),

    // COPY-ON-WRITE MERGE (upsert) through the manifest — Delta's
    // MERGE INTO shape: a per-user changeset replaces matched rows
    // and inserts new users in ONE stats-pruned atomic commit
    // (untouched files carry verbatim — TxnSpec). Base = users with
    // id % 3 != 0; changeset = even users → even ids UPDATE (or
    // insert multiples of 6), odd non-multiples-of-3 keep base rows
    "etl_txn_merge" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txnmg_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("value"))
      def perUser(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
              .as("sum_val"))
      graft.operators.Txn.commitOverwrite(s, root,
        perUser(ev.where(col("user_id") % 3 =!= 0))
          .repartitionByRange(8, col("user_id")),
        statsCol = Some("user_id"))
      // +1000 marks every changeset row, so a silently-dropped UPDATE
      // (head keeping the old row) hash-mismatches — update and no-op
      // must be distinguishable for the gate to pin the merge
      graft.operators.Txn.commitMerge(s, root,
        perUser(ev.where(col("user_id") % 2 === 0))
          .withColumn("n", col("n") + 1000), "user_id",
        statsCol = Some("user_id"))
      // CONDITIONAL clauses (r16 — Delta's WHEN MATCHED AND cond THEN
      // DELETE / UPDATE SET subset): a %5 changeset deletes matched
      // %10 users, bumps the rest by +5000 on n ONLY (sum_val keeps
      // the target's value — a SET that leaked into other columns
      // hash-fails), and still inserts unmatched users
      graft.operators.Txn.commitMerge(s, root,
        perUser(ev.where(col("user_id") % 5 === 0)), "user_id",
        statsCol = Some("user_id"),
        whenMatched = Seq(
          graft.operators.Txn.WhenMatched(
            condition = Some("s.user_id % 10 = 0"), delete = true),
          graft.operators.Txn.WhenMatched(
            set = Map("n" -> "t.n + 5000"))))
      def slice(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.select(lit(tag).as("slice"), col("user_id"), col("n"),
          col("sum_val"))
      slice(graft.operators.Txn.read(s, root), "head")
        .unionByName(slice(graft.operators.Txn.read(s, root, Some(1)),
          "pre"))
    }),

    // SCHEMA EVOLUTION through the manifest: v1 lands (event_type, n)
    // with n committed as INT; the v2 append ADDS sum_val AND WIDENS
    // n to BIGINT under the EXPLICIT mergeSchema=true gate (r15 — an
    // un-flagged drifting append throws at commit; an incompatible
    // retype throws even under the flag — TxnSpec). The snapshot read
    // fills the new column NULL for v1's files and reads v1's int n
    // UP to the widened long (explicit-schema parquet promotion); v1
    // itself stays readable in its original int shape. The oracle
    // emits BIGINT counts for BOTH halves, so a failed widening (n
    // int vs bigint) schema-fails the gate
    "etl_txn_evolve" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txnev_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
      val v1 = ev.where(col("user_id") % 2 === 0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("int").as("n"))
      graft.operators.Txn.commitOverwrite(s, root, v1)
      val v2 = ev.where(col("user_id") % 2 === 1)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
        .select(concat(col("event_type"), lit("_odd")).as("event_type"),
          col("n"), col("sum_val"))
      graft.operators.Txn.commitAppend(s, root, v2, mergeSchema = true)
      graft.operators.Txn.read(s, root)
        .select(col("event_type"), col("n"), col("sum_val"))
    }),

    // COLUMN MAPPING (r16 — rename as metadata, the Delta/Iceberg
    // column-id shape): renameColumn publishes a manifest-only commit
    // (#schema carries the new logical name, #colmap maps it to the
    // stable physical storage name — TxnSpec pins zero data-file
    // churn); the head reads BOTH eras' files under the new name
    // (old files match by physical name, stats/bloom pruning
    // translates), a post-rename append writes under the new name,
    // and v1 still time-travels under the OLD name — both slices
    // recomputed by the oracle
    "etl_txn_rename" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txnrn_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
      graft.operators.Txn.commitOverwrite(s, root,
        ev.where(col("user_id") % 2 === 0)
          .repartitionByRange(4, col("user_id")),
        statsCol = Some("value"))                                  // v1
      graft.operators.Txn.renameColumn(s, root, "value", "amount") // v2
      graft.operators.Txn.commitAppend(s, root,
        ev.where(col("user_id") % 2 === 1)
          .withColumnRenamed("value", "amount"),
        statsCol = Some("amount"))                                 // v3
      def agg(df: org.apache.spark.sql.DataFrame, c: String, tag: String) =
        df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            expr(s"CAST(ROUND(SUM(CAST($c AS DECIMAL(18,6))), 2) AS DOUBLE)")
              .as("sum_val"))
          .select(lit(tag).as("slice"), col("event_type"), col("n"),
            col("sum_val"))
      // head: BOTH halves under the NEW name (v1's files have no
      // physical column named 'amount' — only the mapping finds them);
      // pre: v1 under its ORIGINAL name
      agg(graft.operators.Txn.read(s, root), "amount", "head")
        .unionByName(
          agg(graft.operators.Txn.read(s, root, Some(1)), "value", "pre"))
    }),

    // manifest MULTI-COLUMN STATS + skip-scan (the Iceberg/Delta
    // data-skipping shape at the Txn layer; Delta records 32 columns
    // by default, here the writer declares two): commit
    // range-partitioned files with per-file min/max of BOTH columns
    // recorded in ONE stats pass, then read a conjunctive two-column
    // slice through readWhereAll — only files intersecting BOTH
    // ranges are opened (intersection-count pinned in TxnSpec); the
    // residual predicates keep the result exact however files overlap
    "etl_txn_skipscan" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txnskip_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
      graft.operators.Txn.commitOverwrite(s, root,
        ev.repartitionByRange(8, col("user_id")),
        statsCols = Seq("user_id", "value"))
      graft.operators.Txn.readWhereAll(s, root,
          Seq(("user_id", 100d, 300d), ("value", 0d, 50d)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
    }),

    // retention/TTL as one atomic commit (DELETE WHERE at the Txn
    // layer): files entirely inside the purge range with zero
    // recorded NULLs drop by manifest arithmetic alone (metadata
    // accounting pinned in TxnSpec), boundary files rewrite minus
    // matching rows, NULL keys always survive — the oracle is the
    // complement filter
    "etl_txn_ttl" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txnttl_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
      graft.operators.Txn.commitOverwrite(s, root,
        ev.repartitionByRange(8, col("user_id")),
        statsCols = Seq("user_id"))
      graft.operators.Txn.commitDeleteWhere(s, root, "user_id", 0d, 300d)
      graft.operators.Txn.read(s, root)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
    }),

    // ROLLBACK as a forward commit (Delta RESTORE TABLE): base
    // snapshot → a bad overwrite → restore — the head re-references
    // the base's files verbatim (metadata-only; rewrite-free rollback
    // pinned in TxnSpec), the bad version stays time-travelable, and
    // the oracle is simply the base content
    "etl_txn_restore" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txnrestore_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
      graft.operators.Txn.commitOverwrite(s, root, ev)
      graft.operators.Txn.commitOverwrite(s, root,
        ev.where(col("user_id") < 0)) // the bad commit: wipes the table
      graft.operators.Txn.restore(s, root, toVersion = 1)
      graft.operators.Txn.read(s, root)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
    }),

    // Z-ORDER maintenance at the Txn layer (Delta's OPTIMIZE ZORDER
    // BY): commit a single-column layout, re-cluster along the Morton
    // curve of (user_id, value) with both stats recorded, then read a
    // conjunctive slice — the layout rewrite is invisible to results
    // (the oracle is the plain two-predicate SQL) while the file set
    // opened shrinks to a rectangle (pinned in TxnSpec)
    "etl_txn_zorder" -> ((s, d) => {
      val root = s"/tmp/graft_rt/txnzorder_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
      graft.operators.Txn.commitOverwrite(s, root,
        ev.repartitionByRange(8, col("user_id")))
      graft.operators.Txn.compactZOrder(s, root,
        Seq("user_id", "value"), numFiles = 8) // the N-column API (r16)
      graft.operators.Txn.readWhereAll(s, root,
          Seq(("user_id", 200d, 400d), ("value", 10d, 60d)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
    }),

    // incremental dim load with dense surrogate keys: names already
    // keyed (seen on partkeys < 50) keep their keys; new names get
    // fresh keys above the max — two-level md5-bucket rank, never a
    // single-task global sort
    "etl_surrogate_key" -> ((s, d) => {
      val part = Tables.part(s, d)
      val existing = graft.operators.Keys.surrogate(
        part.where(col("p_partkey") < 50), "p_name")
      graft.operators.Keys.assignNew(existing, part, "p_name")
    }),

    // whole-table content checksum per group — the load-reconciliation
    // primitive: 60-bit md5 row checksums folded through order-free
    // aggregates (decimal-exact SUM + BIT_XOR), so "source == target"
    // is one scan on each system and a tiny comparison, with no row
    // transfer. Doubles enter via a fixed-decimal render (quantities
    // are integral; money is 2dp) — raw double text is engine-dependent
    "etl_checksum" -> ((s, d) =>
      Tables.lineitem(s, d)
        .withColumn("graft_ck", graft.functions.Hashes.rowChecksum(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("decimal(12,0)").cast("string"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS STRING)"),
          col("l_returnflag"), col("l_linestatus")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          expr("CAST(SUM(CAST(graft_ck AS DECIMAL(38,0))) AS STRING)")
            .as("sum_ck"),
          expr("BIT_XOR(graft_ck)").as("xor_ck")))
  )

  val oracle: Map[String, String] = Map(
    "etl_jsonl" ->
      """SELECT event_id, event_type,
        |CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events""".stripMargin,

    "etl_envelope" ->
      """SELECT event_id,
        |'{"type":"record","timestamp":' || CAST(epoch_ms(ts) AS VARCHAR) ||
        |',"version":"0.1.0","schema":"etlp_raw","source_stream":"events","data":{"event_id":'
        | || CAST(event_id AS VARCHAR) || ',"event_type":"' || event_type || '"}}' AS envelope
        |FROM events""".stripMargin,

    "etl_hl7" ->
      """WITH m AS (
        |  SELECT o_orderkey,
        |    'MSH|^~\&|GRAFT|' || CAST(o_orderkey AS VARCHAR) || chr(13) ||
        |    'PID|1||' || CAST(o_custkey AS VARCHAR) || '||' || o_orderstatus || chr(13) ||
        |    'OBX|1|NM|PRICE||' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '|USD' AS msg
        |  FROM orders),
        |segs AS (
        |  SELECT o_orderkey, i AS seg_idx, string_split(msg, chr(13))[i+1] AS seg
        |  FROM m, range(0,3) t(i))
        |SELECT o_orderkey, CAST(seg_idx AS INT) AS seg_idx,
        |  string_split(seg,'|')[1] AS seg_id,
        |  CAST(len(string_split(seg,'|')) AS INT) AS n_fields,
        |  string_split(seg,'|')[4] AS f4
        |FROM segs""".stripMargin,

    "etl_mapping" ->
      """SELECT event_id AS id, UPPER(event_type) AS type_u,
        |CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |CAST(ROUND(value, 4) AS DOUBLE) AS val_r,
        |'events' AS src
        |FROM events""".stripMargin,

    "etl_mapping_nested" ->
      """SELECT doc_id,
        |to_json(struct_pack(
        |  meta := struct_pack(lang := lang,
        |                      n_tokens := len(string_split(text, ' '))),
        |  id := doc_id)) AS env_json,
        |CASE WHEN lang = 'en' THEN 'english' ELSE 'other' END AS tag,
        |array_to_string(list_transform(string_split(text, ' ')[1:3],
        |                               t -> upper(t)), ' ') AS head_upper
        |FROM documents""".stripMargin,

    "etl_mapping_full" ->
      """SELECT doc_id,
        |CASE lang WHEN 'en' THEN 'english' WHEN 'es' THEN 'spanish'
        |     ELSE 'other' END AS lang_class,
        |CAST(list_sum([length(t) for t in string_split(text, ' ')])
        |     AS BIGINT) AS tok_chars,
        |substring(text, 1, 12) AS head12,
        |upper(substring(text, 1, 5)) AS upper_head
        |FROM documents""".stripMargin,

    "etl_dag" ->
      """SELECT 'clicks' AS branch, CAST(user_id % 10 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS DOUBLE) AS val
        |FROM events WHERE event_type = 'click' GROUP BY 2
        |UNION ALL
        |SELECT 'purchases' AS branch, CAST(user_id % 10 AS BIGINT) AS bucket,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS val
        |FROM events WHERE event_type = 'purchase' GROUP BY 2""".stripMargin,

    "etl_csv_roundtrip" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "etl_jsonl_roundtrip" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,

    "etl_orc_roundtrip" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "etl_compact" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "etl_fixedwidth_roundtrip" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "etl_xml_roundtrip" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
        |MAX(o_orderpriority) AS max_pri
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "etl_avro_roundtrip" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
        |strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_date
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "etl_error_channel" ->
      // NULL-safe split: a NULL `value` must land in the error channel
      // (Spark's ErrorChannel routes NULL attempts there); plain
      // WHERE NOT(FLOOR(value) > 0) would drop NULL rows from BOTH
      // branches, silently losing records
      """SELECT 'record' AS channel, event_id,
        |  CAST(FLOOR(value) AS INT) AS parsed, CAST(NULL AS VARCHAR) AS envelope
        |FROM events WHERE FLOOR(value) > 0
        |UNION ALL
        |SELECT 'error' AS channel, CAST(NULL AS BIGINT) AS event_id,
        |  CAST(NULL AS INT) AS parsed,
        |  '{"type":"error","timestamp":' || CAST(epoch_ms(ts) AS VARCHAR) ||
        |  ',"version":"0.1.0","schema":"etlp_raw","source_stream":"events","data":{"event_id":'
        |  || CAST(event_id AS VARCHAR) || '}}' AS envelope
        |FROM events WHERE (FLOOR(value) > 0) IS NOT TRUE""".stripMargin,

    "etl_registry" ->
      """SELECT 'p_clicks' AS processor, 'check' AS command, TRUE AS ok,
        |  CAST(0 AS BIGINT) AS n_records
        |UNION ALL
        |SELECT 'p_clicks', 'start', TRUE,
        |  (SELECT COUNT(*) FROM events WHERE event_type = 'click')
        |UNION ALL
        |SELECT 'p_purchases', 'check', TRUE, CAST(0 AS BIGINT)
        |UNION ALL
        |SELECT 'p_purchases', 'start', TRUE,
        |  (SELECT COUNT(*) FROM events
        |   WHERE event_type = 'purchase' AND value >= 0.5)""".stripMargin,

    "etl_count_sink" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS records,
        |CAST(CEIL(COUNT(*) / 100.0) AS BIGINT) AS batches
        |FROM events WHERE event_type = 'click'""".stripMargin,

    "etl_upsert" ->
      """SELECT user_id, event_type, event_id, ts,
        |  CAST(ROUND(value, 4) AS DOUBLE) AS val_r
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin,

    // IS NOT TRUE mirrors applyCdc's NULL-tombstone guard: a NULL
    // event_type must KEEP its key on both engines
    "etl_cdc_apply" ->
      """SELECT user_id, event_id, event_type, ts
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 AND (event_type = 'error') IS NOT TRUE""".stripMargin,

    "etl_scd2" ->
      """SELECT user_id, CAST(row_number() OVER w AS INT) AS version,
        |  event_id, ts AS valid_from, lead(ts) OVER w AS valid_to,
        |  (lead(ts) OVER w IS NULL) AS is_current
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""".stripMargin,

    // the two argmax reductions as rn=1 windows (unique by
    // construction: one base row per key, reprice shifts valid_from,
    // correction shifts tx_from)
    "etl_bitemporal" ->
      """WITH led AS (
        |  SELECT o_orderkey AS order_key, o_orderdate AS valid_from,
        |    TIMESTAMP '1998-01-01 00:00:00' AS tx_from,
        |    CAST(o_totalprice AS DOUBLE) AS price FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_orderdate + INTERVAL 180 DAY,
        |    TIMESTAMP '1998-01-01 00:00:00',
        |    CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.9 AS DECIMAL(2,1)), 2) AS DOUBLE)
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderdate,
        |    TIMESTAMP '1998-06-01 00:00:00',
        |    CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |ao AS (SELECT * FROM (VALUES
        |  ('1998-03-01 00:00:00', TIMESTAMP '1998-03-01 00:00:00'),
        |  ('1998-12-31 00:00:00', TIMESTAMP '1998-12-31 00:00:00')) t(tag, tx)),
        |s1 AS (
        |  SELECT ao.tag, l.order_key, l.valid_from, l.tx_from, l.price,
        |    ROW_NUMBER() OVER (PARTITION BY ao.tag, l.order_key, l.valid_from
        |                       ORDER BY l.tx_from DESC) AS rn
        |  FROM ao JOIN led l ON l.tx_from <= ao.tx),
        |s2 AS (
        |  SELECT tag, order_key, valid_from, tx_from, price,
        |    ROW_NUMBER() OVER (PARTITION BY tag, order_key
        |                       ORDER BY valid_from DESC) AS rn2
        |  FROM s1
        |  WHERE rn = 1 AND valid_from <= TIMESTAMP '1996-01-01 00:00:00')
        |SELECT order_key, tag AS as_of_tx, valid_from, tx_from, price
        |FROM s2 WHERE rn2 = 1""".stripMargin,

    "etl_pseudonymize" ->
      """WITH pc AS (SELECT md5('graft-pseud:r7:' || CAST(c_custkey AS VARCHAR)) AS pid,
        |  c_mktsegment FROM customer),
        |po AS (SELECT md5('graft-pseud:r7:' || CAST(o_custkey AS VARCHAR)) AS pid,
        |  o_totalprice FROM orders)
        |SELECT c_mktsegment, CAST(COUNT(DISTINCT pc.pid) AS BIGINT) AS n_customers,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders, MIN(pc.pid) AS min_pid,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
        |FROM pc JOIN po ON pc.pid = po.pid
        |GROUP BY c_mktsegment""".stripMargin,

    // identical seeded-Laplace arithmetic: 52 md5 bits → u → inverse
    // CDF; double literals forced (DuckDB parses bare 0.5 as DECIMAL)
    "etl_dp_counts" ->
      """WITH c AS (SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY 1),
        |u AS (SELECT o_orderpriority, n,
        |  (CAST(('0x' || substr(md5('graft-dp:r7:' || CAST(o_orderpriority AS VARCHAR)), 1, 13))::UBIGINT AS DOUBLE)
        |    / 4503599627370496.0) - CAST(0.5 AS DOUBLE) AS u
        |  FROM c)
        |SELECT o_orderpriority,
        |  CAST(ROUND(n + (-SIGN(u) * LN(GREATEST(CAST(1.0 AS DOUBLE) - 2 * ABS(u),
        |    CAST(1e-12 AS DOUBLE))) / CAST(1.0 AS DOUBLE)), 4) + 0.0 AS DOUBLE) AS dp_n
        |FROM u""".stripMargin,

    // naive quadratic point-in-time form (latest valid_from <= ts,
    // version desc tie-break) — checks the as-of union+window plan
    "etl_scd2_lookup" ->
      """WITH dim AS (
        |  SELECT user_id, CAST(row_number() OVER w AS INT) AS version,
        |    event_id AS purchase_id, ts AS valid_from
        |  FROM events WHERE event_type = 'purchase'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |f AS (SELECT event_id AS click_id, user_id, ts FROM events
        |      WHERE event_type = 'click')
        |SELECT click_id, user_id, version, purchase_id FROM (
        |  SELECT f.click_id, f.user_id, d.version, d.purchase_id,
        |    ROW_NUMBER() OVER (PARTITION BY f.click_id
        |      ORDER BY d.valid_from DESC NULLS LAST, d.version DESC NULLS LAST) AS rn
        |  FROM f LEFT JOIN dim d
        |    ON d.user_id = f.user_id AND d.valid_from <= f.ts)
        |WHERE rn = 1""".stripMargin,

    // IS NOT TRUE mirrors Quality.checkRules' null-counts-as-violation
    "etl_dq_rules" ->
      """SELECT 'qty_positive' AS rule, CAST(COUNT(*) AS BIGINT) AS n_checked,
        |  CAST(COUNT(*) FILTER (WHERE (l_quantity > 0) IS NOT TRUE) AS BIGINT) AS n_violations,
        |  COUNT(*) FILTER (WHERE (l_quantity > 0) IS NOT TRUE) = 0 AS passed
        |FROM lineitem
        |UNION ALL
        |SELECT 'qty_max_45', COUNT(*),
        |  COUNT(*) FILTER (WHERE (l_quantity <= 45) IS NOT TRUE),
        |  COUNT(*) FILTER (WHERE (l_quantity <= 45) IS NOT TRUE) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'price_positive', COUNT(*),
        |  COUNT(*) FILTER (WHERE (l_extendedprice > 0) IS NOT TRUE),
        |  COUNT(*) FILTER (WHERE (l_extendedprice > 0) IS NOT TRUE) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'flag_domain', COUNT(*),
        |  COUNT(*) FILTER (WHERE (l_returnflag IN ('A','N','R')) IS NOT TRUE),
        |  COUNT(*) FILTER (WHERE (l_returnflag IN ('A','N','R')) IS NOT TRUE) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'ship_after_1992', COUNT(*),
        |  COUNT(*) FILTER (WHERE (l_shipdate >= TIMESTAMP '1992-01-01 00:00:00') IS NOT TRUE),
        |  COUNT(*) FILTER (WHERE (l_shipdate >= TIMESTAMP '1992-01-01 00:00:00') IS NOT TRUE) = 0
        |FROM lineitem""".stripMargin,

    // generate_series over the same observed min/max; isodow == Spark
    // weekday()+1 (both Monday=1)
    "etl_date_dim" ->
      """WITH r AS (
        |  SELECT MIN(CAST(o_orderdate AS DATE)) AS a,
        |    MAX(CAST(o_orderdate AS DATE)) AS b
        |  FROM orders),
        |d AS (
        |  SELECT CAST(unnest(generate_series(a, b, INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM r WHERE a IS NOT NULL)
        |SELECT d, CAST(year(d) AS INT) AS year,
        |  CAST(quarter(d) AS INT) AS quarter,
        |  CAST(month(d) AS INT) AS month,
        |  CAST(day(d) AS INT) AS day,
        |  CAST(isodow(d) AS INT) AS iso_dow,
        |  isodow(d) >= 6 AS is_weekend,
        |  d = last_day(d) AS is_month_end
        |FROM d""".stripMargin,

    // same NULL-counts-as-violation rule; names joined in definition
    // order (the list literal's order, not alphabetic)
    "etl_quarantine" ->
      """WITH f AS (
        |  SELECT l_orderkey, l_linenumber,
        |    list_filter([
        |      CASE WHEN (l_quantity <= 45) IS NOT TRUE THEN 'qty_max_45' END,
        |      CASE WHEN (l_discount <= 0.05) IS NOT TRUE THEN 'discount_le_05' END,
        |      CASE WHEN (l_returnflag IN ('A','N','R')) IS NOT TRUE THEN 'flag_domain' END,
        |      CASE WHEN (l_shipdate >= TIMESTAMP '1992-01-01 00:00:00') IS NOT TRUE
        |        THEN 'ship_after_1992' END
        |    ], x -> x IS NOT NULL) AS fr
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, CAST(len(fr) AS INT) AS n_failed,
        |  array_to_string(fr, ',') AS failed_rules
        |FROM f WHERE len(fr) > 0""".stripMargin,

    "er_match" ->
      """WITH t AS (
        |  SELECT c_custkey AS id, c_name AS nm, c_nationkey, c_mktsegment,
        |    substr(c_name, 1, length(c_name) - 2) AS name_blk
        |  FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.nm, b.nm) AS INT) AS distance
        |FROM t a JOIN t b
        |  ON a.c_nationkey = b.c_nationkey
        |  AND a.c_mktsegment = b.c_mktsegment
        |  AND a.name_blk = b.name_blk
        |  AND a.id < b.id
        |WHERE levenshtein(a.nm, b.nm) <= 2""".stripMargin,

    "etl_forget" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey % 10 <> 3""".stripMargin,

    // identical class-count logic (two grouped counts, second over the
    // sub-k remainder only); level-0 strings render detail QI, level-1
    // coarse QI, else '*'
    "etl_kanon" ->
      """WITH base AS (
        |  SELECT c_custkey, n_name, r_name, c_mktsegment AS seg,
        |    CAST(floor(c_acctbal/1100) AS BIGINT) AS bd,
        |    CAST(floor(c_acctbal/4400) AS BIGINT) AS bc
        |  FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |c0 AS (SELECT n_name, seg, bd, count(*) AS n0
        |       FROM base GROUP BY 1, 2, 3),
        |j0 AS (SELECT b.*, c0.n0 FROM base b
        |       JOIN c0 ON b.n_name = c0.n_name AND b.seg = c0.seg
        |         AND b.bd = c0.bd),
        |c1 AS (SELECT r_name, seg, bc, count(*) AS n1
        |       FROM j0 WHERE n0 < 12 GROUP BY 1, 2, 3),
        |j1 AS (SELECT j0.*, c1.n1 FROM j0
        |       LEFT JOIN c1 ON j0.r_name = c1.r_name AND j0.seg = c1.seg
        |         AND j0.bc = c1.bc)
        |SELECT c_custkey,
        |  CAST(CASE WHEN n0 >= 12 THEN 0 WHEN n1 >= 12 THEN 1
        |       ELSE 2 END AS INT) AS anon_level,
        |  CASE WHEN n0 >= 12 THEN n_name||'/'||seg||'/'||CAST(bd AS VARCHAR)
        |       WHEN n1 >= 12 THEN r_name||'/'||seg||'/'||CAST(bc AS VARCHAR)
        |       ELSE '*' END AS qi_out
        |FROM j1""".stripMargin,

    // etl_kanon's anonymization with seg OUT of the QI, then the
    // per-class distinct-sensitive rollup
    "etl_ldiversity" ->
      """WITH base AS (
        |  SELECT c_custkey, n_name, r_name, c_mktsegment AS seg,
        |    CAST(floor(c_acctbal/1100) AS BIGINT) AS bd,
        |    CAST(floor(c_acctbal/4400) AS BIGINT) AS bc
        |  FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |c0 AS (SELECT n_name, bd, count(*) AS n0 FROM base GROUP BY 1, 2),
        |j0 AS (SELECT b.*, c0.n0 FROM base b
        |       JOIN c0 ON b.n_name = c0.n_name AND b.bd = c0.bd),
        |c1 AS (SELECT r_name, bc, count(*) AS n1
        |       FROM j0 WHERE n0 < 12 GROUP BY 1, 2),
        |j1 AS (SELECT j0.*, c1.n1 FROM j0
        |       LEFT JOIN c1 ON j0.r_name = c1.r_name AND j0.bc = c1.bc),
        |rel AS (
        |  SELECT seg,
        |    CAST(CASE WHEN n0 >= 12 THEN 0 WHEN n1 >= 12 THEN 1
        |         ELSE 2 END AS INT) AS anon_level,
        |    CASE WHEN n0 >= 12 THEN n_name||'/'||CAST(bd AS VARCHAR)
        |         WHEN n1 >= 12 THEN r_name||'/'||CAST(bc AS VARCHAR)
        |         ELSE '*' END AS qi_out
        |  FROM j1)
        |SELECT anon_level, qi_out, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_sensitive,
        |  COUNT(DISTINCT seg) >= 3 AS l_ok
        |FROM rel GROUP BY 1, 2""".stripMargin,

    "etl_ttl" ->
      """SELECT event_id, user_id, event_type,
        |  strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(ROUND(value, 4) AS DOUBLE) AS val_r
        |FROM events
        |WHERE strftime(ts, '%Y-%m-%d') >= '2024-01-10'""".stripMargin,

    // baseline-defined equal-width bins, add-1 smoothing, ROUND(·,6)
    // terms + exact decimal total — mirrors Profile.psiDrift
    "etl_drift" ->
      """WITH base AS (
        |  SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
        |  WHERE o_orderkey % 3 = 0 AND o_totalprice IS NOT NULL),
        |cur AS (
        |  SELECT CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.5
        |              ELSE o_totalprice END AS DOUBLE) AS v
        |  FROM orders WHERE o_orderkey % 3 <> 0 AND o_totalprice IS NOT NULL),
        |st AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM base),
        |cb AS (
        |  SELECT CAST(LEAST(GREATEST(
        |      CASE WHEN (SELECT mx FROM st) = (SELECT mn FROM st) THEN 0.0
        |           ELSE FLOOR((v - (SELECT mn FROM st))
        |             / (((SELECT mx FROM st) - (SELECT mn FROM st)) / 10)) END,
        |    0.0), 9.0) AS INT) AS bin, COUNT(*) AS n_base
        |  FROM base GROUP BY 1),
        |cc AS (
        |  SELECT CAST(LEAST(GREATEST(
        |      CASE WHEN (SELECT mx FROM st) = (SELECT mn FROM st) THEN 0.0
        |           ELSE FLOOR((v - (SELECT mn FROM st))
        |             / (((SELECT mx FROM st) - (SELECT mn FROM st)) / 10)) END,
        |    0.0), 9.0) AS INT) AS bin, COUNT(*) AS n_cur
        |  FROM cur GROUP BY 1),
        |frame AS (
        |  SELECT CAST(r.bin AS INT) AS bin,
        |    COALESCE(cb.n_base, 0) AS n_base, COALESCE(cc.n_cur, 0) AS n_cur
        |  FROM range(0, 10) r(bin)
        |  LEFT JOIN cb ON cb.bin = r.bin LEFT JOIN cc ON cc.bin = r.bin),
        |tot AS (SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc FROM frame),
        |terms AS (
        |  SELECT bin, CAST(n_base AS BIGINT) AS n_base,
        |    CAST(n_cur AS BIGINT) AS n_cur,
        |    CAST(ROUND(
        |      ((n_base + 1.0) / ((SELECT tb FROM tot) + 10)
        |        - (n_cur + 1.0) / ((SELECT tc FROM tot) + 10))
        |      * ln(((n_base + 1.0) / ((SELECT tb FROM tot) + 10))
        |          / ((n_cur + 1.0) / ((SELECT tc FROM tot) + 10))),
        |    6) AS DOUBLE) AS psi_term
        |  FROM frame)
        |SELECT bin, n_base, n_cur, psi_term,
        |  (SELECT CAST(SUM(CAST(psi_term AS DECIMAL(38,6))) AS DOUBLE)
        |   FROM terms) AS psi_total
        |FROM terms""".stripMargin,

    // er_match pairs + recursive reachability CC (min-label closure) +
    // singleton fill-in, then the same survivorship aggregate
    "er_cluster" ->
      """WITH RECURSIVE t AS (
        |  SELECT c_custkey AS id, c_name AS nm, c_acctbal, c_nationkey,
        |    c_mktsegment, substr(c_name, 1, length(c_name) - 2) AS name_blk
        |  FROM customer),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM t a JOIN t b
        |    ON a.c_nationkey = b.c_nationkey
        |    AND a.c_mktsegment = b.c_mktsegment
        |    AND a.name_blk = b.name_blk
        |    AND a.id < b.id
        |  WHERE levenshtein(a.nm, b.nm) <= 2),
        |nodes AS (SELECT DISTINCT id_a AS n FROM p UNION SELECT id_b FROM p),
        |e AS (SELECT id_a AS s, id_b AS d FROM p UNION ALL SELECT id_b, id_a FROM p),
        |reach AS (
        |  SELECT n AS node, n AS lbl FROM nodes
        |  UNION
        |  SELECT e.d AS node, reach.lbl FROM reach JOIN e ON e.s = reach.node),
        |cc AS (SELECT node AS id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
        |mem AS (
        |  SELECT t.id, COALESCE(cc.cluster_id, t.id) AS cluster_id
        |  FROM t LEFT JOIN cc USING (id))
        |SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
        |  MAX(CASE WHEN id = cluster_id THEN nm END) AS canonical_name,
        |  CAST(ROUND(CAST(MAX(c_acctbal) AS DOUBLE), 2) AS DOUBLE) AS max_acctbal
        |FROM mem JOIN t USING (id)
        |GROUP BY cluster_id""".stripMargin,

    // the er_cluster recursive-CC body + the same survivorship windows
    "er_golden" ->
      """WITH RECURSIVE t AS (
        |  SELECT c_custkey AS id, c_name AS nm, c_acctbal, c_nationkey,
        |    c_mktsegment, substr(c_name, 1, length(c_name) - 2) AS name_blk
        |  FROM customer),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM t a JOIN t b
        |    ON a.c_nationkey = b.c_nationkey
        |    AND a.c_mktsegment = b.c_mktsegment
        |    AND a.name_blk = b.name_blk
        |    AND a.id < b.id
        |  WHERE levenshtein(a.nm, b.nm) <= 2),
        |nodes AS (SELECT DISTINCT id_a AS n FROM p UNION SELECT id_b FROM p),
        |e AS (SELECT id_a AS s, id_b AS d FROM p UNION ALL SELECT id_b, id_a FROM p),
        |reach AS (
        |  SELECT n AS node, n AS lbl FROM nodes
        |  UNION
        |  SELECT e.d AS node, reach.lbl FROM reach JOIN e ON e.s = reach.node),
        |cc AS (SELECT node AS id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
        |mem AS (
        |  SELECT t.id, t.nm, t.c_acctbal, t.c_mktsegment,
        |    COALESCE(cc.cluster_id, t.id) AS cluster_id
        |  FROM t LEFT JOIN cc USING (id)),
        |named AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
        |    ORDER BY length(nm), nm) AS rn
        |  FROM mem),
        |seg AS (
        |  SELECT cluster_id, c_mktsegment AS segment FROM (
        |    SELECT cluster_id, c_mktsegment,
        |      ROW_NUMBER() OVER (PARTITION BY cluster_id
        |        ORDER BY COUNT(*) DESC, c_mktsegment ASC) AS rn
        |    FROM mem GROUP BY cluster_id, c_mktsegment)
        |  WHERE rn = 1)
        |SELECT n.cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
        |  MIN(id) AS golden_id,
        |  MAX(CASE WHEN rn = 1 THEN nm END) AS name,
        |  MAX(seg.segment) AS segment,
        |  CAST(ROUND(CAST(MAX(c_acctbal) AS DOUBLE), 2) AS DOUBLE) AS acctbal
        |FROM named n JOIN seg ON n.cluster_id = seg.cluster_id
        |GROUP BY n.cluster_id""".stripMargin,

    "etl_diff" ->
      """WITH a AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey % 50 <> 1),
        |b AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 50 = 3 THEN 'X' ELSE o_orderstatus END
        |      AS o_orderstatus,
        |    CASE WHEN o_orderkey % 50 = 3 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderpriority
        |  FROM orders WHERE o_orderkey % 50 <> 2),
        |j AS (
        |  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |    CASE WHEN a.o_orderkey IS NULL THEN 'added'
        |         WHEN b.o_orderkey IS NULL THEN 'removed'
        |         WHEN concat_ws(',',
        |            CASE WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |                 THEN 'o_orderstatus' END,
        |            CASE WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |                 THEN 'o_totalprice' END,
        |            CASE WHEN a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
        |                 THEN 'o_orderpriority' END) <> ''
        |         THEN 'changed' END AS status,
        |    concat_ws(',',
        |      CASE WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |           THEN 'o_orderstatus' END,
        |      CASE WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |           THEN 'o_totalprice' END,
        |      CASE WHEN a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
        |           THEN 'o_orderpriority' END) AS cw
        |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
        |SELECT o_orderkey, status,
        |  CASE WHEN status = 'changed' THEN cw ELSE '' END AS changed_cols
        |FROM j WHERE status IS NOT NULL""".stripMargin,

    "etl_incr_agg" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_v,
        |  MIN(CAST(value AS DOUBLE)) AS min_v,
        |  MAX(CAST(value AS DOUBLE)) AS max_v,
        |  CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |    / COUNT(*), 4) AS DOUBLE) AS avg_v
        |FROM events WHERE value IS NOT NULL GROUP BY event_type""".stripMargin,

    "etl_schema_evolve" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) FILTER (WHERE o_orderkey % 2 = 1) AS BIGINT) AS n_price,
        |  CAST(ROUND(SUM(CASE WHEN o_orderkey % 2 = 1
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS sum_price
        |FROM orders""".stripMargin,

    // the two-level rank (md5 bucket → in-bucket row_number → bucket
    // offset) is replicated literally: surrogate keys are defined by
    // that computation, so the oracle runs it too, twice (existing then
    // fresh above the max)
    "etl_surrogate_key" ->
      """WITH ex0 AS (SELECT DISTINCT p_name AS nat FROM part WHERE p_partkey < 50),
        |b0 AS (SELECT nat, ('0x'||substr(md5('sk:'||nat),1,8))::BIGINT % 64 AS gb FROM ex0),
        |o0 AS (SELECT gb, COUNT(*) AS bn FROM b0 GROUP BY gb),
        |c0 AS (SELECT gb, COALESCE(SUM(bn) OVER (ORDER BY gb ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS boff FROM o0),
        |r0 AS (SELECT nat, gb, ROW_NUMBER() OVER (PARTITION BY gb ORDER BY nat) AS rn FROM b0),
        |ex AS (SELECT nat, CAST(boff + rn AS BIGINT) AS sk FROM r0 JOIN c0 USING (gb)),
        |mx AS (SELECT COALESCE(MAX(sk), 0) AS mx FROM ex),
        |f0 AS (SELECT DISTINCT p_name AS nat FROM part
        |       WHERE p_name NOT IN (SELECT nat FROM ex)),
        |b1 AS (SELECT nat, ('0x'||substr(md5('sk:'||nat),1,8))::BIGINT % 64 AS gb FROM f0),
        |o1 AS (SELECT gb, COUNT(*) AS bn FROM b1 GROUP BY gb),
        |c1 AS (SELECT gb, COALESCE(SUM(bn) OVER (ORDER BY gb ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS boff FROM o1),
        |r1 AS (SELECT nat, gb, ROW_NUMBER() OVER (PARTITION BY gb ORDER BY nat) AS rn FROM b1),
        |fr AS (SELECT nat, CAST(boff + rn + (SELECT mx FROM mx) AS BIGINT) AS sk
        |       FROM r1 JOIN c1 USING (gb))
        |SELECT nat AS p_name, sk FROM ex
        |UNION ALL SELECT nat, sk FROM fr""".stripMargin,

    // base = the even half, delta = exactly the odd half — a delta
    // repeating base rows (or missing new ones) mismatches
    "etl_txn_changes" ->
      """SELECT 'base' AS slice, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events WHERE user_id % 2 = 0 GROUP BY 2
        |UNION ALL
        |SELECT 'delta', event_type, CAST(COUNT(*) AS BIGINT),
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
        |FROM events WHERE user_id % 2 = 1 GROUP BY 2""".stripMargin,

    // merged head = changeset rows (even users) + untouched base rows
    // (odd, non-multiple-of-3); pre = the base recompute
    // v2 replace-all merge then v3 conditional clauses: matched %10
    // users delete, other matched %5 users bump n by 5000 (sum_val
    // untouched), unmatched %5 users (odd multiples of 15) insert
    "etl_txn_merge" ->
      """WITH per AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |  FROM events GROUP BY 1),
        |v2 AS (
        |  SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN n + 1000 ELSE n END AS n, sum_val
        |  FROM per WHERE user_id % 2 = 0 OR user_id % 3 <> 0)
        |SELECT 'head' AS slice, user_id,
        |  CASE WHEN user_id % 5 = 0 THEN n + 5000 ELSE n END AS n, sum_val
        |FROM v2 WHERE user_id % 10 <> 0
        |UNION ALL
        |SELECT 'head', user_id, n, sum_val FROM per
        |WHERE user_id % 5 = 0
        |  AND NOT (user_id % 2 = 0 OR user_id % 3 <> 0)
        |UNION ALL
        |SELECT 'pre', user_id, n, sum_val FROM per
        |WHERE user_id % 3 <> 0""".stripMargin,

    // head = filtered recompute; pre-delete snapshot = full recompute
    "etl_txn_forget" ->
      """SELECT 'head' AS slice, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events WHERE user_id % 10 <> 3 GROUP BY 2
        |UNION ALL
        |SELECT 'pre', event_type, CAST(COUNT(*) AS BIGINT),
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
        |FROM events GROUP BY 2""".stripMargin,

    // one semantics, second mechanism: the DV (merge-on-read) delete
    // answers the SAME oracle as the copy-on-write etl_txn_forget —
    // a masked read that leaks a deleted row, or a mask that over-
    // deletes, hash-fails here
    "etl_txn_forget_dv" ->
      """SELECT 'head' AS slice, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events WHERE user_id % 10 <> 3 GROUP BY 2
        |UNION ALL
        |SELECT 'pre', event_type, CAST(COUNT(*) AS BIGINT),
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
        |FROM events GROUP BY 2""".stripMargin,

    // rename is metadata-only and invisible to VALUES: head = both
    // halves under the new name, pre = the v1 half under the old one
    "etl_txn_rename" ->
      """SELECT 'head' AS slice, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 2
        |UNION ALL
        |SELECT 'pre', event_type, CAST(COUNT(*) AS BIGINT),
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
        |FROM events WHERE user_id % 2 = 0 GROUP BY 2""".stripMargin,

    // per-commit CDF multisets recomputed from source: v2 append =
    // the odd half inserted; v3 compact = self-cancelling
    // delete+insert of everything; v4 copy-on-write delete (no stats
    // → all files rewrite) = everything deleted, survivors reinserted
    // the plain IN filter — the point read must return exactly the
    // keyed users' rows however the interleaved files overlap
    "etl_txn_pointread" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events WHERE user_id % 97 = 5
        |GROUP BY 1""".stripMargin,

    // the string-range slice recomputed from raw timestamps
    "etl_txn_skipscan_str" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events
        |WHERE strftime(ts, '%Y-%m-%d') BETWEEN '2024-01-10' AND '2024-01-19'
        |GROUP BY 1""".stripMargin,

    // partition-scoped fold is pure layout: head == plain recompute
    "etl_txn_compact_where" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1""".stripMargin,

    // string-keyed twin: the %10==3 uids were GDPR-deleted first, so
    // the point read returns the keyed users MINUS the forgotten ones
    // — a silent no-op delete (the r14 string-key bug) hash-fails
    "etl_txn_pointread_str" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events WHERE user_id % 97 = 5 AND user_id % 10 <> 3
        |GROUP BY 1""".stripMargin,

    "etl_txn_cdf" ->
      """WITH agg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |  FROM events GROUP BY 1)
        |SELECT 'insert' AS change, CAST(2 AS INTEGER) AS v, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events WHERE user_id % 2 = 1 GROUP BY 3
        |UNION ALL
        |SELECT 'delete', CAST(3 AS INTEGER), event_type, n, sum_val FROM agg
        |UNION ALL
        |SELECT 'insert', CAST(3 AS INTEGER), event_type, n, sum_val FROM agg
        |UNION ALL
        |SELECT 'delete', CAST(4 AS INTEGER), event_type, n, sum_val FROM agg
        |UNION ALL
        |SELECT 'insert', CAST(4 AS INTEGER), event_type,
        |  CAST(COUNT(*) AS BIGINT),
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
        |FROM events WHERE user_id % 10 <> 3 GROUP BY 3""".stripMargin,

    // compaction is layout-only: the table equals the plain recompute
    "etl_txn_compact" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1""".stripMargin,

    // v1 rows carry NULL for the column the v2 append introduced
    "etl_txn_evolve" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(NULL AS DOUBLE) AS sum_val
        |FROM events WHERE user_id % 2 = 0 GROUP BY 1
        |UNION ALL
        |SELECT event_type || '_odd', CAST(COUNT(*) AS BIGINT),
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
        |FROM events WHERE user_id % 2 = 1 GROUP BY 1""".stripMargin,

    // the plain filtered recompute: if skip-scan pruned a file it
    // shouldn't have (or kept rows outside the range), the hash fails
    "etl_txn_skipscan" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events WHERE user_id >= 100 AND user_id <= 300
        |  AND value >= 0 AND value <= 50
        |GROUP BY 1""".stripMargin,

    // DELETE WHERE user_id in [0,300] == keep the complement (NULL
    // keys never match a range predicate and survive)
    "etl_txn_ttl" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events
        |WHERE user_id IS NULL OR user_id < 0 OR user_id > 300
        |GROUP BY 1""".stripMargin,

    // restore(1) after a table-wiping overwrite == the original
    // snapshot: the oracle is the plain aggregate over all events
    "etl_txn_restore" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1""".stripMargin,

    // the Z-order rewrite is pure layout: the oracle is the plain
    // two-predicate aggregate over the same rows
    "etl_txn_zorder" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events WHERE user_id >= 200 AND user_id <= 400
        |  AND value >= 10 AND value <= 60
        |GROUP BY 1""".stripMargin,

    // both branches recomputed inline: per-rule violation counts over
    // the SAME NULL-is-violation semantics, and the published table
    // from rows passing every rule — a drift in either DAG branch, the
    // shared verdict expression, or the Txn publish/read-back mismatches
    "etl_pipeline" ->
      """WITH v AS (
        |  SELECT l_returnflag,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(1.0 - l_discount AS DECIMAL(18,4)) AS rev,
        |    NOT COALESCE(l_quantity <= 45, FALSE) AS b1,
        |    NOT COALESCE(l_discount <= 0.05, FALSE) AS b2,
        |    NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE) AS b3,
        |    NOT COALESCE(l_shipdate >= TIMESTAMP '1992-01-01 00:00:00', FALSE) AS b4
        |  FROM lineitem)
        |SELECT 'quarantine' AS branch, r AS key, CAST(n AS BIGINT) AS n,
        |  CAST(NULL AS DOUBLE) AS amount
        |FROM (
        |  SELECT 'qty_max_45' AS r, SUM(CASE WHEN b1 THEN 1 ELSE 0 END) AS n FROM v
        |  UNION ALL SELECT 'discount_le_05', SUM(CASE WHEN b2 THEN 1 ELSE 0 END) FROM v
        |  UNION ALL SELECT 'flag_domain', SUM(CASE WHEN b3 THEN 1 ELSE 0 END) FROM v
        |  UNION ALL SELECT 'ship_after_1992', SUM(CASE WHEN b4 THEN 1 ELSE 0 END) FROM v) q
        |UNION ALL
        |SELECT 'published', l_returnflag, CAST(COUNT(*) AS BIGINT),
        |  CAST(ROUND(SUM(rev), 2) AS DOUBLE)
        |FROM v WHERE NOT (b1 OR b2 OR b3 OR b4) GROUP BY 2""".stripMargin,

    // both snapshots recomputed from scratch: v1 = half-user counts,
    // latest = half-user counts with click/view replaced by full counts
    // (the partition overwrite) — if the v2 commit tore v1's files or
    // the manifest showed a mixed state, either branch would mismatch
    "etl_txn_commit" ->
      """WITH half AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE user_id % 2 = 0 GROUP BY 1),
        |fullc AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1)
        |SELECT 'v1' AS snapshot, event_type, n FROM half
        |UNION ALL
        |SELECT 'latest', event_type, n FROM (
        |  SELECT event_type, n FROM half
        |  WHERE event_type NOT IN ('click', 'view')
        |  UNION ALL SELECT event_type, n FROM fullc) u""".stripMargin,

    // doubling is an exact fp op, so no rounding is needed on either side
    "etl_partition_overwrite" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority = '1-URGENT'
        |       THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
        |  o_orderpriority
        |FROM orders""".stripMargin,

    // min/max render via printf for the double column — raw
    // double→VARCHAR casts disagree between engines (Java flips to
    // scientific notation at 1e7); integers/strings cast natively
    "etl_profile" ->
      """SELECT 'o_custkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
        |  CAST(MIN(o_custkey) AS VARCHAR) AS min_s,
        |  CAST(MAX(o_custkey) AS VARCHAR) AS max_s FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
        |  COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus), MAX(o_orderstatus)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
        |  COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority),
        |  MAX(o_orderpriority) FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
        |  COUNT(DISTINCT o_totalprice), printf('%.4f', MIN(o_totalprice)),
        |  printf('%.4f', MAX(o_totalprice)) FROM orders""".stripMargin,

    // the oracle recomputes the identical 60-bit checksum: md5 of the
    // same '|'-joined canonical string (NULL slots render as the same
    // chr(1) sentinel the operator uses), first 15 hex digits as a hex
    // cast — engine-portable by construction
    "etl_checksum" ->
      """WITH ck AS (
        |  SELECT l_returnflag,
        |    ('0x' || substr(md5(
        |      IFNULL(CAST(l_orderkey AS VARCHAR), chr(1)) || '|' ||
        |      IFNULL(CAST(l_linenumber AS VARCHAR), chr(1)) || '|' ||
        |      IFNULL(CAST(CAST(l_quantity AS DECIMAL(12,0)) AS VARCHAR), chr(1)) || '|' ||
        |      IFNULL(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR), chr(1)) || '|' ||
        |      IFNULL(l_returnflag, chr(1)) || '|' ||
        |      IFNULL(l_linestatus, chr(1))), 1, 15))::BIGINT AS c
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(c AS DECIMAL(38,0))) AS VARCHAR) AS sum_ck,
        |  BIT_XOR(c) AS xor_ck
        |FROM ck GROUP BY l_returnflag""".stripMargin
  )
}
