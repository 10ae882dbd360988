package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.compile.{MappingCompiler, Relationship}
import graft.gen.DataGenerator
import graft.spec.MappingSpec

/** Oracle-checked coverage for the mapping-spec engine — the reference's
  * core capability (SURVEY.md §1.3, §2.3, §2.4): spec parsing, source
  * extraction with WHERE, rename/enrich projection, relationship-path
  * parent joins, IN-list lookups, and the write-back ID pairing.
  *
  * Each query parses a spec from the reference's JSON wire format (so the
  * codec itself is under the correctness gate) and runs the compiled
  * DataFrame program over the TPC-H-ish test tables.
  */
object Mapping {

  /** A customer migration spec in the reference's exact JSON shape
    * (snake_case keys, array-of-specs — mapping_parser.py:14-28). The
    * source exposes Salesforce-style `Id` + a write-back column
    * `dst_ref`; `constants` replaces the reference's hard-coded owner-ID
    * enrichment (migration_engine.py:39-41). */
  private val customerSpecJson = """
    [{"source_object": "customer_src",
      "destination_object": "customer_dst",
      "where_condition": "acctbal > 1000",
      "mapping": [
        {"table_src": "customer_src", "column_src": "Id",
         "table_dst": "customer_dst", "column_dst": "old_id",
         "operation": "copy", "column_type": "src_id"},
        {"table_src": "customer_src", "column_src": "name",
         "table_dst": "customer_dst", "column_dst": "name",
         "operation": "copy", "column_type": "regular"},
        {"table_src": "customer_src", "column_src": "acctbal",
         "table_dst": "customer_dst", "column_dst": "acctbal",
         "operation": "copy", "column_type": "regular"},
        {"table_src": "customer_src", "column_src": "Id",
         "table_dst": "customer_dst", "column_dst": "type",
         "operation": "copy", "column_type": "regular"},
        {"table_src": "customer_src", "column_src": "dst_ref",
         "table_dst": "customer_dst", "column_dst": "Id",
         "operation": "upd_src", "column_type": "dst_id"}],
      "constants": {"segment": "MIGRATED"}}]"""

  def customerSpec: MappingSpec = MappingSpec.fromJson(customerSpecJson).head

  /** customer table dressed as a Salesforce-ish source object. */
  private def customerSrc(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "customer").select(
      col("c_custkey").cast("string").as("Id"),
      col("c_name").as("name"),
      col("c_acctbal").as("acctbal"),
      lit(null).cast("string").as("dst_ref"))

  private def catalog(s: SparkSession, d: String): String => DataFrame = {
    case "customer_src" => customerSrc(s, d)
    case other => Tables(s, d, other)
  }

  /** Relationship-path spec: orders rows projecting the parent customer's
    * name — the dotted `Parent.Column` SOQL form (mapping_parser.py:34-38)
    * compiled to a broadcast left join. */
  private val ordersSpecJson = """
    [{"source_object": "orders",
      "destination_object": "orders_dst",
      "where_condition": "o_totalprice > 400000",
      "mapping": [
        {"table_src": "orders", "column_src": "o_orderkey",
         "table_dst": "orders_dst", "column_dst": "old_id",
         "operation": "copy", "column_type": "src_id"},
        {"table_src": "customer", "column_src": "c_name",
         "table_dst": "orders_dst", "column_dst": "cust_name",
         "operation": "copy", "column_type": "regular"}]}]"""

  def ordersSpec: MappingSpec = MappingSpec.fromJson(ordersSpecJson).head

  val ordersRels: Seq[Relationship] =
    Seq(Relationship("orders", "o_custkey", "customer", "c_custkey"))

  val defs: Seq[QueryDef] = Seq(

    // ---- m01: extract + rename + type + constants (migrate steps 1-2) ----
    QueryDef(
      "m01_mapping_project",
      (s, d) => {
        val spec = customerSpec
        val extracted = MappingCompiler.sourceQuery(catalog(s, d), spec)
        MappingCompiler.destinationRows(extracted, spec).orderBy("old_id")
      },
      Some("""
        SELECT CAST(c_custkey AS VARCHAR) AS old_id,
               c_name AS name,
               c_acctbal AS acctbal,
               'customer_dst' AS type,
               CAST(NULL AS VARCHAR) AS Id,
               'MIGRATED' AS segment
        FROM customer
        WHERE c_acctbal > 1000
        ORDER BY old_id""")),

    // ---- m02: write-back ID pairing (migration_engine.py:50-68) ----------
    QueryDef(
      "m02_mapping_writeback",
      (s, d) => {
        val spec = customerSpec
        val extracted = MappingCompiler.sourceQuery(catalog(s, d), spec)
        val created = MappingCompiler.destinationRows(extracted, spec)
          .withColumn("Id", concat(lit("D"), col("old_id")))
        MappingCompiler.writeBackRows(created, spec).orderBy("Id")
      },
      Some("""
        SELECT 'D' || CAST(c_custkey AS VARCHAR) AS dst_ref,
               CAST(c_custkey AS VARCHAR) AS Id
        FROM customer
        WHERE c_acctbal > 1000
        ORDER BY Id""")),

    // ---- m03: relationship-path column → broadcast parent join ------------
    QueryDef(
      "m03_mapping_relationship",
      (s, d) => {
        val spec = ordersSpec
        val extracted = MappingCompiler.sourceQuery(catalog(s, d), spec, ordersRels)
        MappingCompiler.destinationRows(extracted, spec).orderBy("old_id")
      },
      Some("""
        SELECT o_orderkey AS old_id, c_name AS cust_name
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 400000
        ORDER BY old_id""")),

    // ---- m04: IN-list lookup (mapping_parser.py:56-82 intent) --------------
    QueryDef(
      "m04_inlist_lookup",
      (s, d) => {
        val keys: Seq[Any] = Seq(1L, 7L, 42L, 99L, 123L, 500L)
        MappingCompiler.filterByKeys(
            Tables(s, d, "part").select(col("p_partkey"), col("p_name")),
            "p_partkey", keys)
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey, p_name
        FROM part
        WHERE p_partkey IN (1, 7, 42, 99, 123, 500)
        ORDER BY p_partkey""")),

    // ---- m05: synthetic data generator — FULLY oracle-gated: every
    // value is an md5-derived pure function of (seed, row id, column
    // name), and DuckDB computes the identical digests, so the oracle
    // regenerates the whole frame bit-for-bit from range(1000). The
    // timestamp column ships as epoch seconds (the registry's epoch-ms/us
    // convention for cross-engine timestamp compares). -------------------
    QueryDef(
      "m05_datagen",
      (s, _) => {
        // the reference's Account struct (test_data_generator.py:9-36)
        val struct = Seq(
          "Name" -> "text", "type" -> "ObjectName",
          "Billing_Address__c" -> "text", "Billing_City__c" -> "text",
          "Billing_County__c" -> "text", "Billing_Zip_Code__c" -> "int",
          "Shipping_Address__c" -> "text", "Shipping_City__c" -> "text",
          "Shipping_County__c" -> "text", "Shipping_Zip_Code__c" -> "int",
          "Account_Birthday__c" -> "date", "Website" -> "text")
        val defaults = Map(
          "Billing_City__c" -> "San Antonio", "Billing_County__c" -> "USA",
          "Shipping_City__c" -> "San Antonio", "Shipping_County__c" -> "USA",
          "Website" -> "www.example.com")
        val prefixes = Map(
          "Name" -> "Account name_",
          "Billing_Address__c" -> "Street_Billing_Address_",
          "Shipping_Address__c" -> "Street_Shipping_Address_")
        DataGenerator.generate(s, struct, defaults, prefixes,
            n = 1000, objectName = "Account", seed = 42L)
          .withColumn("Account_Birthday__c",
            col("Account_Birthday__c").cast("long"))
          .withColumnRenamed("Account_Birthday__c", "birthday_epoch")
          .orderBy("Name")
      },
      Some {
        // replays DataGenerator's md5 scheme: genString = upper 10/20 hex
        // chars of md5(id|seed|col); genInt/genDate = 60-bit hex prefix of
        // the same digest, mod the reference's ranges
        def hs(colName: String, len: Int) =
          s"upper(substr(md5(concat_ws('|', id, 42, '$colName')), 1, $len))"
        def hp(colName: String) =
          s"('0x' || substr(md5(concat_ws('|', id, 42, '$colName')), 1, 15))::BIGINT"
        s"""
        SELECT
          'Account name_' || ${hs("Name", 10)} AS "Name",
          'Account' AS "type",
          'Street_Billing_Address_' || ${hs("Billing_Address__c", 10)}
            AS "Billing_Address__c",
          'San Antonio' AS "Billing_City__c",
          'USA' AS "Billing_County__c",
          CAST(${hp("Billing_Zip_Code__c")} % 90001 + 10000 AS INTEGER)
            AS "Billing_Zip_Code__c",
          'Street_Shipping_Address_' || ${hs("Shipping_Address__c", 10)}
            AS "Shipping_Address__c",
          'San Antonio' AS "Shipping_City__c",
          'USA' AS "Shipping_County__c",
          CAST(${hp("Shipping_Zip_Code__c")} % 90001 + 10000 AS INTEGER)
            AS "Shipping_Zip_Code__c",
          ${hp("Account_Birthday__c")} % (1483277400 - 946733400) + 946733400
            AS birthday_epoch,
          'www.example.com' AS "Website"
        FROM range(1000) t(id)
        ORDER BY "Name""""
      }),

    // ---- m06: post-migration reconciliation (keyed snapshot diff) --------
    // the audit the reference never does after migrating: one full-outer
    // join classifying every key as added/removed/changed with the
    // differing columns listed. The right side is a deterministic
    // perturbation of customer (drops, edits, additions), so the
    // discrepancy set is exactly reproducible in the oracle.
    QueryDef(
      "m06_reconcile",
      (s, d) => {
        val base = Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            col("c_acctbal"))
        val kept = base.where(pmod(col("c_custkey"), lit(97)) =!= 0)
          .withColumn("c_acctbal",
            when(pmod(col("c_custkey"), lit(89)) === 0, col("c_acctbal") + 10)
              .otherwise(col("c_acctbal")))
        val added = base.where(pmod(col("c_custkey"), lit(101)) === 0)
          .withColumn("c_custkey", col("c_custkey") + 1000000)
        graft.engine.Reconcile
          .diff(base, kept.unionByName(added), "c_custkey")
          .orderBy("c_custkey", "status")
      },
      Some("""
        WITH base AS (
          SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer),
        right_t AS (
          SELECT c_custkey, c_name, c_nationkey,
                 CASE WHEN c_custkey % 89 = 0 THEN c_acctbal + 10
                      ELSE c_acctbal END AS c_acctbal
          FROM base WHERE c_custkey % 97 <> 0
          UNION ALL
          SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal
          FROM base WHERE c_custkey % 101 = 0),
        j AS (
          SELECT COALESCE(l.c_custkey, r.c_custkey) AS c_custkey,
                 CASE WHEN l.c_custkey IS NULL THEN 'added'
                      WHEN r.c_custkey IS NULL THEN 'removed'
                      WHEN (l.c_name IS DISTINCT FROM r.c_name)
                        OR (l.c_nationkey IS DISTINCT FROM r.c_nationkey)
                        OR (l.c_acctbal IS DISTINCT FROM r.c_acctbal)
                        THEN 'changed'
                      ELSE 'same' END AS status,
                 CASE WHEN l.c_custkey IS NOT NULL AND r.c_custkey IS NOT NULL
                      THEN concat_ws(',',
                        CASE WHEN l.c_name IS DISTINCT FROM r.c_name
                             THEN 'c_name' END,
                        CASE WHEN l.c_nationkey IS DISTINCT FROM r.c_nationkey
                             THEN 'c_nationkey' END,
                        CASE WHEN l.c_acctbal IS DISTINCT FROM r.c_acctbal
                             THEN 'c_acctbal' END)
                      ELSE '' END AS changed_cols
          FROM base l FULL OUTER JOIN right_t r ON l.c_custkey = r.c_custkey)
        SELECT c_custkey, status, changed_cols FROM j
        WHERE status <> 'same'
        ORDER BY c_custkey, status"""),
      bench = true),

    // ---- m07: table profiling (pre/post-migration column stats) ----------
    // one wide aggregation -> long format; every counter map-side
    // combinable, exact distinct counts, numeric/timestamp min-max as
    // doubles. The column-level generalization of the reference's
    // record-count validation.
    QueryDef(
      "m07_profile",
      (s, d) =>
        graft.engine.Profile.profile(Tables(s, d, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"))
          .orderBy("column"),
      Some {
        def row(c: String, minMax: String => String) =
          s"""SELECT '$c' AS "column",
              CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
              COUNT(DISTINCT $c) AS n_distinct,
              ${minMax("MIN")} AS min_num, ${minMax("MAX")} AS max_num
              FROM orders"""
        val num = (c: String) => (f: String) => s"CAST($f($c) AS DOUBLE)"
        val ts = (c: String) => (f: String) => s"CAST(epoch_us($f($c)) AS DOUBLE)"
        val str = (_: String) => (_: String) => "CAST(NULL AS DOUBLE)"
        Seq(
          row("o_orderkey", num("o_orderkey")),
          row("o_custkey", num("o_custkey")),
          row("o_orderstatus", str("o_orderstatus")),
          row("o_totalprice", num("o_totalprice")),
          row("o_orderdate", ts("o_orderdate")),
          row("o_orderpriority", str("o_orderpriority")))
          .mkString("", "\nUNION ALL\n", "\nORDER BY 1")
      }),

    // ---- m08: SCD2 dimension history merge -------------------------------
    // the warehouse-side continuation of the write-back sinks: fold a
    // new snapshot into a keyed history, closing changed rows and
    // appending fresh versions. One full-outer join + a two-row explode
    // (engine/Scd2.scala); the incoming snapshot is a deterministic
    // perturbation of customer so DuckDB rebuilds the identical merge.
    QueryDef(
      "m08_scd2",
      (s, d) => scd2History(s, d).orderBy("c_custkey", "version_from"),
      Some(s"""
        $scd2HistorySql
        SELECT * FROM history
        ORDER BY c_custkey, version_from""")),

    // ---- m09: incremental aggregate maintenance --------------------------
    // the materialized-view / streaming-state shape: per-group partial
    // states (count + decimal-exact sum) from the standing table and
    // from a delta batch MERGE associatively — sum-of-sums, sum-of-
    // counts — instead of rescanning the union. The oracle computes the
    // direct aggregate over the union, pinning that the merge of
    // partials IS the aggregate of the whole (the property that makes
    // the state reusable per delta at any scale).
    QueryDef(
      "m09_incremental_agg",
      (s, d) => {
        val orders = Tables(s, d, "orders")
        val delta = orders.where(pmod(col("o_orderkey"), lit(10)) === 0)
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("o_custkey")
            .agg(count(lit(1)).as("n_orders"),
              sum(col("o_totalprice").cast("decimal(18,2)")).as("__t"))
        partial(orders).unionByName(partial(delta))
          .groupBy("o_custkey")
          .agg(sum(col("n_orders")).as("n_orders"),
            sum(col("__t")).cast("double").as("total"))
          .orderBy("o_custkey")
      },
      Some("""
        WITH all_orders AS (
          SELECT o_custkey, o_totalprice FROM orders
          UNION ALL
          SELECT o_custkey, o_totalprice FROM orders WHERE o_orderkey % 10 = 0
        )
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM all_orders GROUP BY 1 ORDER BY 1""")),

    // ---- m10: point-in-time lookup against the SCD2 history --------------
    // the history table USED: each order carries an as-of version
    // (synthetic: o_orderkey%3=0 reads the v0 world, else v1) and joins
    // the customer row valid at that version — equi-join on the key plus
    // the [version_from, version_to) range predicate, the standard
    // temporal-dimension lookup. Segment renames between versions shift
    // the per-(version, segment) counts, which is exactly what the
    // oracle pins.
    QueryDef(
      "m10_scd2_lookup",
      (s, d) => {
        val hist = scd2History(s, d)
        val orders = Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            when(pmod(col("o_orderkey"), lit(3)) === 0, lit(0L))
              .otherwise(lit(1L)).as("as_of_version"))
        orders.join(hist,
            orders("o_custkey") === hist("c_custkey") &&
            hist("version_from") <= orders("as_of_version") &&
            orders("as_of_version") < hist("version_to"))
          .groupBy(col("as_of_version"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("as_of_version", "c_mktsegment")
      },
      Some(s"""
        $scd2HistorySql
        SELECT o.as_of_version, h.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM (
          SELECT o_custkey,
                 CAST(CASE WHEN o_orderkey % 3 = 0 THEN 0 ELSE 1 END AS BIGINT)
                   AS as_of_version
          FROM orders) o
        JOIN history h
          ON h.c_custkey = o.o_custkey
         AND h.version_from <= o.as_of_version
         AND o.as_of_version < h.version_to
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- m11: the product pipeline END TO END through Structured
    // Streaming — extract → where → rename/enrich → created-ID
    // write-back pairing (mriya.py:88-90 → migration_engine.py:50-68),
    // every micro-batch running the SAME compiled MappingCompiler
    // program the batch engine uses (m01/m02 gate that program in batch
    // mode; this gates its streaming execution). Created IDs are
    // simulated exactly as m02 does ("D" + old_id) and the write-back
    // pairs land in a parquet sink the gate reads back — so the m02
    // oracle hash-gates the streaming pipeline. ---------------------------
    QueryDef(
      "m11_migrate_stream",
      (s, d) =>
        graft.streaming.Streams.migrateStreamGate(
            s, s"$d/customer.parquet", customerSpec,
            df => df.select(
              col("c_custkey").cast("string").as("Id"),
              col("c_name").as("name"),
              col("c_acctbal").as("acctbal"),
              lit(null).cast("string").as("dst_ref")))
          .orderBy("Id"),
      Some("""
        SELECT 'D' || CAST(c_custkey AS VARCHAR) AS dst_ref,
               CAST(c_custkey AS VARCHAR) AS Id
        FROM customer
        WHERE c_acctbal > 1000
        ORDER BY Id""")),

    // ---- m12: MERGE INTO (CDC upsert) — the lakehouse primitive the
    // connector upsert and the SCD2 fold specialize: matched keys take
    // the delta row, unmatched targets survive, unmatched deltas
    // insert. Delta = %7 balance-bump updates + %101 new keys; the
    // oracle replays the full-outer merge row-for-row (balances exact
    // via the +100 integer bump on the loaded double). ---------------------
    QueryDef(
      "m12_merge_upsert",
      (s, d) => {
        val base = Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        val updates = base.where(pmod(col("c_custkey"), lit(7)) === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 100)
          .withColumn("c_mktsegment", lit("UPDATED"))
        val inserts = base.where(pmod(col("c_custkey"), lit(101)) === 0)
          .withColumn("c_custkey", col("c_custkey") + 1000000)
        graft.engine.Merge.into(base,
            updates.unionByName(inserts), "c_custkey")
          .orderBy("c_custkey")
      },
      Some("""
        WITH base AS (
          SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
        delta AS (
          SELECT c_custkey, 'UPDATED' AS c_mktsegment,
                 c_acctbal + 100 AS c_acctbal
          FROM base WHERE c_custkey % 7 = 0
          UNION ALL
          SELECT c_custkey + 1000000, c_mktsegment, c_acctbal
          FROM base WHERE c_custkey % 101 = 0)
        SELECT COALESCE(d.c_custkey, b.c_custkey) AS c_custkey,
               CASE WHEN d.c_custkey IS NOT NULL
                    THEN d.c_mktsegment ELSE b.c_mktsegment END AS c_mktsegment,
               CASE WHEN d.c_custkey IS NOT NULL
                    THEN d.c_acctbal ELSE b.c_acctbal END AS c_acctbal
        FROM base b FULL OUTER JOIN delta d ON b.c_custkey = d.c_custkey
        ORDER BY c_custkey""")),

    // ---- m13: full CDC apply (upserts + tombstone deletes) ----------------
    // the Debezium-shaped change feed over m12's MERGE: op='U' rows
    // upsert (source wins / insert), op='D' rows delete. Delta: %7
    // non-%13 balance bumps (U), %13 tombstones (D), %101 new keys (U)
    // — disjoint per key, the per-key-compacted CDC precondition. The
    // tombstone set anti-joins as a broadcast; the oracle replays the
    // full-outer merge minus deleted keys row-for-row.
    QueryDef(
      "m13_cdc_apply",
      (s, d) => {
        val base = Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        val updates = base
          .where(pmod(col("c_custkey"), lit(7)) === 0 &&
            pmod(col("c_custkey"), lit(13)) =!= 0)
          .withColumn("c_acctbal", col("c_acctbal") + 100)
          .withColumn("c_mktsegment", lit("UPDATED"))
          .withColumn("op", lit("U"))
        val deletes = base.where(pmod(col("c_custkey"), lit(13)) === 0)
          .withColumn("op", lit("D"))
        val inserts = base.where(pmod(col("c_custkey"), lit(101)) === 0)
          .withColumn("c_custkey", col("c_custkey") + 1000000)
          .withColumn("op", lit("U"))
        graft.engine.Merge.applyCdc(base,
            updates.unionByName(deletes).unionByName(inserts),
            "c_custkey", "op")
          .orderBy("c_custkey")
      },
      Some("""
        WITH base AS (
          SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
        ups AS (
          SELECT c_custkey, 'UPDATED' AS c_mktsegment,
                 c_acctbal + 100 AS c_acctbal
          FROM base WHERE c_custkey % 7 = 0 AND c_custkey % 13 <> 0
          UNION ALL
          SELECT c_custkey + 1000000, c_mktsegment, c_acctbal
          FROM base WHERE c_custkey % 101 = 0),
        dels AS (SELECT c_custkey FROM base WHERE c_custkey % 13 = 0),
        merged AS (
          SELECT COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
                 CASE WHEN u.c_custkey IS NOT NULL
                      THEN u.c_mktsegment ELSE b.c_mktsegment END AS c_mktsegment,
                 CASE WHEN u.c_custkey IS NOT NULL
                      THEN u.c_acctbal ELSE b.c_acctbal END AS c_acctbal
          FROM base b FULL OUTER JOIN ups u ON b.c_custkey = u.c_custkey)
        SELECT m.c_custkey, m.c_mktsegment, m.c_acctbal
        FROM merged m
        WHERE NOT EXISTS (SELECT 1 FROM dels WHERE dels.c_custkey = m.c_custkey)
        ORDER BY m.c_custkey""")),

    // ---- m14: migration dry-run report ------------------------------------
    // the pre-flight an operator reviews before m02 actually writes:
    // source volume, rows the spec's WHERE keeps/excludes, key
    // distinctness, selected share — all SPEC-DRIVEN on the Spark side
    // (the filtered count comes from MappingCompiler.sourceQuery, not a
    // re-typed predicate), long-form (metric, value) rows via stack.
    QueryDef(
      "m14_dry_run",
      (s, d) => {
        val spec = customerSpec
        val src = catalog(s, d)(spec.sourceObject)
        val filtered = MappingCompiler.sourceQuery(catalog(s, d), spec)
        val a = src.agg(count(lit(1)).as("source_rows"),
          countDistinct(col("Id")).as("distinct_keys"))
        val b = filtered.agg(count(lit(1)).as("filtered_rows"))
        a.crossJoin(broadcast(b))
          .select(expr("""stack(5,
            'distinct_keys', distinct_keys,
            'excluded_rows', source_rows - filtered_rows,
            'filtered_rows', filtered_rows,
            'selected_permille', (filtered_rows * 1000) div source_rows,
            'source_rows', source_rows) AS (metric, value)"""))
          .orderBy("metric")
      },
      Some("""
        WITH s AS (
          SELECT count(*) AS source_rows,
                 CAST(count(DISTINCT c_custkey) AS BIGINT) AS distinct_keys,
                 CAST(sum(CASE WHEN c_acctbal > 1000 THEN 1 ELSE 0 END)
                   AS BIGINT) AS filtered_rows
          FROM customer)
        SELECT metric, CAST(value AS BIGINT) AS value FROM (
          SELECT 'source_rows' AS metric, source_rows AS value FROM s
          UNION ALL SELECT 'filtered_rows', filtered_rows FROM s
          UNION ALL SELECT 'excluded_rows', source_rows - filtered_rows FROM s
          UNION ALL SELECT 'distinct_keys', distinct_keys FROM s
          UNION ALL SELECT 'selected_permille',
            (filtered_rows * 1000) // source_rows FROM s)
        ORDER BY metric"""))
  )

  /** The shared SCD2 fixture: customer as version 0 folded with a
    * deterministic version-1 snapshot (%5 segment rename, %89 balance
    * bump, %97 departures, %101 new keys) — m08 emits it, m10 joins
    * against it. */
  private def scd2History(s: SparkSession, d: String): DataFrame = {
    val base = Tables(s, d, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment"))
    val current = base.withColumn("version_from", lit(0L))
    val kept = base.where(pmod(col("c_custkey"), lit(97)) =!= 0)
      .withColumn("c_acctbal",
        when(pmod(col("c_custkey"), lit(89)) === 0, col("c_acctbal") + 10)
          .otherwise(col("c_acctbal")))
      .withColumn("c_mktsegment",
        when(pmod(col("c_custkey"), lit(5)) === 0,
          concat(col("c_mktsegment"), lit("#2")))
          .otherwise(col("c_mktsegment")))
    val added = base.where(pmod(col("c_custkey"), lit(101)) === 0)
      .withColumn("c_custkey", col("c_custkey") + 1000000)
    graft.engine.Scd2.merge(current, kept.unionByName(added),
      "c_custkey", Seq("c_nationkey", "c_acctbal", "c_mktsegment"),
      newVersion = 1L)
  }

  /** DuckDB rebuild of [[scd2History]] as a `history` CTE (shared by the
    * m08 and m10 oracles). */
  private lazy val scd2HistorySql: String = """
        WITH cur AS (
          SELECT c_custkey, CAST(0 AS BIGINT) AS version_from,
                 c_nationkey, c_acctbal, c_mktsegment
          FROM customer
        ), inc AS (
          SELECT c_custkey, c_nationkey,
                 CASE WHEN c_custkey % 89 = 0 THEN c_acctbal + 10
                      ELSE c_acctbal END AS c_acctbal,
                 CASE WHEN c_custkey % 5 = 0 THEN c_mktsegment || '#2'
                      ELSE c_mktsegment END AS c_mktsegment
          FROM customer WHERE c_custkey % 97 <> 0
          UNION ALL
          SELECT c_custkey + 1000000, c_nationkey, c_acctbal, c_mktsegment
          FROM customer WHERE c_custkey % 101 = 0
        ), j AS (
          SELECT cur.c_custkey AS ck, inc.c_custkey AS ik, cur.version_from,
                 cur.c_nationkey AS n0, cur.c_acctbal AS a0, cur.c_mktsegment AS m0,
                 inc.c_nationkey AS n1, inc.c_acctbal AS a1, inc.c_mktsegment AS m1,
                 (cur.c_nationkey IS DISTINCT FROM inc.c_nationkey
                  OR cur.c_acctbal IS DISTINCT FROM inc.c_acctbal
                  OR cur.c_mktsegment IS DISTINCT FROM inc.c_mktsegment) AS chg
          FROM cur FULL OUTER JOIN inc ON cur.c_custkey = inc.c_custkey
        ), history AS (
          SELECT ck AS c_custkey, version_from, CAST(1 AS BIGINT) AS version_to,
                 n0 AS c_nationkey, a0 AS c_acctbal, m0 AS c_mktsegment,
                 FALSE AS is_current
          FROM j WHERE ck IS NOT NULL AND ik IS NOT NULL AND chg
          UNION ALL
          SELECT ik, CAST(1 AS BIGINT), CAST(999999 AS BIGINT), n1, a1, m1, TRUE
          FROM j WHERE ik IS NOT NULL AND (ck IS NULL OR chg)
          UNION ALL
          SELECT ck, version_from, CAST(999999 AS BIGINT), n0, a0, m0, TRUE
          FROM j WHERE ck IS NOT NULL AND (ik IS NULL OR NOT chg)
        )"""
}
