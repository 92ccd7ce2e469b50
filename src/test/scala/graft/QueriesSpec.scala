package graft

/** Smoke net: every §2 inventory entry runs on sf0.001 without throwing,
  * and the flagship entry returns rows (the driver's t1 check). */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      // Gate outputs must stay inside the comparator's exact range:
      // parquet decimals with precision > 18 round-trip through the
      // oracle harness as float64 and hash-mismatch on identical
      // values (the r10/r11 graph_modularity failure class). Wide
      // decimals are fine INTERNALLY — at the gate boundary, emit
      // canonical strings or split BIGINT parts instead.
      df.schema.fields.foreach { f =>
        f.dataType match {
          case dt: org.apache.spark.sql.types.DecimalType =>
            assert(dt.precision <= 18,
              s"$name.${f.name}: gate output decimal(${dt.precision},${dt.scale}) " +
                "exceeds the comparator-exact precision 18 — cast to string/bigint")
          case _ => ()
        }
      }
      assert(df.count() >= 0)
    }
  }

  test("q_pipeline: the DAG-composed chain fuses into one pruned plan") {
    val plan = SparkEntry.queries("q_pipeline")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // rank→topk collapsed to WindowGroupLimit = map-side top-5 pruning
    // BEFORE the per-nation shuffle — the composition fused across the
    // DAG node boundary instead of ranking everything and filtering
    assert(plan.contains("WindowGroupLimit"),
      "rank<=k not pushed into the window sort")
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"))
    // node boundaries are plan composition, not materialization
    assert(!plan.contains("LocalTableScan") || plan.contains("Scan parquet"),
      "DAG output lost its lineage to the parquet scans")
  }
}
