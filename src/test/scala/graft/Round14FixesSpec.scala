package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

/** Regression coverage for the round-14 maintenance items (both r13
  * ADVICE findings): the q80 dump-inventory diagnostic reports a
  * missing/null info.json checksum as its own named integrity fact
  * instead of an anonymous NoSuchElementException/NPE, and
  * `fromJsonBody` rejects both wire-contract violations (non-dict body,
  * non-ISO key) from ONE driver job instead of running the parse
  * pipeline twice per serving-path call.
  */
class Round14FixesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("q80 integrity fact names a missing/null checksum instead of crashing") {
    // the same tampered-artifact scenario Persistence.loadFull /
    // AnnIndex.load reject with the contract exception (r13); the dump
    // INVENTORY's job is to report, so the fact reports — previously
    // info("checksum").toString was an anonymous NoSuchElementException
    // (no key) or NPE (checksum: null)
    val f = graft.operators.AnomalyQueries.checksumFact _
    assert(f(Map("impl" -> "x"), "ab") == "checksum_missing")
    assert(f(Map("checksum" -> null), "ab") == "checksum_missing")
    assert(f(Map("checksum" -> "ab"), "ab") == "checksum_matches_true")
    assert(f(Map("checksum" -> "cd"), "ab") == "checksum_matches_false")
  }

  test("fromJsonBody probes both wire contracts without a single Spark job") {
    // r13 ADVICE: the null-map check and the null-ts scan each consumed
    // the from_json + double-explode pipeline — two sequential driver
    // jobs per request on the serve path. The folded probe is a single
    // Project over the 1-row LocalRelation (no Generate), so Catalyst's
    // ConvertToLocalRelation evaluates it at optimization time and
    // head() never submits a job at all — the probe now costs ZERO jobs
    // per request. Pin that with job-group-scoped onJobStart counts
    // (parallel suites in the shared session can't pollute a group) and
    // a sentinel action in a SECOND group: the listener bus is FIFO, so
    // once the sentinel's event lands, any earlier probe event would
    // already have been delivered.
    val sc = spark.sparkContext
    val probeGroup = "graft-r14-probe"
    val sentinelGroup = "graft-r14-sentinel"
    val probeJobs = new AtomicInteger(0)
    val sentinelJobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        // properties is nullable on low-level submission paths; a
        // parallel suite's propertyless job must not NPE this listener
        Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")) match {
          case Some(`probeGroup`)    => probeJobs.incrementAndGet()
          case Some(`sentinelGroup`) => sentinelJobs.incrementAndGet()
          case _                     => ()
        }
    }
    sc.addSparkListener(listener)
    try {
      sc.setJobGroup(probeGroup, "r14 fromJsonBody probe-count")
      // construction runs the probes only; no action on the result yet
      graft.data.Providers.fromJsonBody(spark,
        """{"t1": {"2020-01-01T00:10:00Z": 2.5,
          |        "2020-01-01T00:00:00Z": 1.5},
          | "t2": {"2020-01-01T00:05:00Z": 9.0}}""".stripMargin)
      sc.setJobGroup(sentinelGroup, "r14 sentinel")
      assert(spark.range(2).count() == 2)
      sc.clearJobGroup()
      val deadline = System.currentTimeMillis() + 30000
      while (sentinelJobs.get() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(25)
      assert(sentinelJobs.get() >= 1, "sentinel job event must arrive")
      assert(probeJobs.get() == 0,
        s"fromJsonBody's folded probe must submit no job, ran ${probeJobs.get()}")
    } finally sc.removeSparkListener(listener)
  }

  test("YAML merge keys, duplicate keys, aliases and 1.1 scalars reach the bridge resolved") {
    // deterministic pins under the r14 YAML-text fuzz (ConfigFuzzProps):
    // the bridge depends on snakeyaml resolving these BEFORE toScala —
    // merge keys flatten with machine-side override precedence,
    // duplicate mapping keys are last-wins, underscore/hex ints arrive
    // as Integers, and an anchored list aliased into two slots is the
    // same logical value in both
    import graft.config.Config
    val doc =
      """base: &base
        |  tags: &t [TAG-1, TAG-2]
        |  resolution: 1H
        |name: m1
        |project_name: p
        |dataset:
        |  <<: *base
        |  type: RandomDataset
        |  row_filter_buffer_size: 9
        |dataset:
        |  <<: *base
        |  resolution: 10T
        |  target_tag_list: *t
        |  row_filter_buffer_size: 1_000
        |  n_samples_threshold: 0x10
        |model: {sklearn.preprocessing.MinMaxScaler: {}}""".stripMargin
    val spec = Config.machineFromConfig(Config.parseYaml(doc), None, Map.empty)
    val ds = Config.datasetConfig(spec)
    assert(ds.tags == Seq("TAG-1", "TAG-2"), "merge key must flatten the base")
    assert(ds.targetTags == Seq("TAG-1", "TAG-2"), "alias reuse resolves")
    assert(ds.resolution == "10T",
      "the machine-side key overrides the merged base; duplicate dataset is last-wins")
    assert(ds.rowFilterBufferSize == 1000, "YAML 1.1 underscore int")
    assert(ds.nSamplesThreshold == 16L, "YAML 1.1 hex int")
  }

  test("a truncated influx values row is a null-point row, not a failed job") {
    // found by the r14 structured wire fuzz on first contact: a values
    // row SHORTER than its column list put the (in-bounds) column
    // index out of bounds for that row, and under Spark's default ANSI
    // mode element_at threw an anonymous
    // INVALID_ARRAY_INDEX_IN_ELEMENT_AT job failure — the documented
    // contract is the influx null-point shape (malformed cell → null
    // field, neighbors intact), the same ANSI hole class as r13's
    // to_timestamp/cast finds. try_element_at restores it; overlong
    // rows stay ignored-extra-cells.
    val json = """{"results":[{"series":[{"name":"m","tags":{"tag":"T1"},
      |"columns":["time","Value"],
      |"values":[["2020-01-01T00:00:00Z"],
      |["2020-01-01T00:01:00Z","2.5","extra"],
      |["2020-01-01T00:02:00Z","1.5"]]}]}]}""".stripMargin
    val rows = graft.data.Influx.fromQueryResponse(spark, json)
      .orderBy(org.apache.spark.sql.functions.col("ts")).collect()
    assert(rows.length == 3, "short/long rows must not drop or kill rows")
    assert(!rows(0).isNullAt(1) && rows(0).isNullAt(2),
      "truncated row -> ts intact, null value")
    assert(rows(1).getDouble(2) == 2.5, "overlong row -> extra cell ignored")
    assert(rows(2).getDouble(2) == 1.5)
  }

  test("the folded probe keeps both loud contract rejects and valid-body results") {
    import graft.data.Providers.fromJsonBody
    // non-dict / unparseable bodies: loud, named, NOT the empty frame
    for (bad <- Seq("<html>oops</html>", "[1, 2]", "null", "{\"a\": {"))
      assert(intercept[IllegalArgumentException](fromJsonBody(spark, bad))
        .getMessage.contains("dict-of-dicts"), s"body: '$bad'")
    // non-ISO key: loud, names the offending key (r13 ANSI fuzz pin)
    val e = intercept[IllegalArgumentException](
      fromJsonBody(spark, "{\"t\": {\"not a ts\": 1.0}}"))
    assert(e.getMessage.contains("non-ISO timestamp key"), e.getMessage)
    assert(e.getMessage.contains("not a ts"), e.getMessage)
    // a null inner series must not MASK a bad key elsewhere in the
    // same body: flatten() returns null when any element is null, so
    // the naive fold silently skipped this reject (caught by this
    // round's own review pass; the coalesce-to-empty-array restores
    // the r13 behavior)
    val masked = intercept[IllegalArgumentException](
      fromJsonBody(spark, "{\"a\": null, \"b\": {\"junk\": 1}}"))
    assert(masked.getMessage.contains("non-ISO timestamp key"),
      masked.getMessage)
    assert(masked.getMessage.contains("junk"), masked.getMessage)
    // a LONE null series keeps the r13 behavior: dropped like an
    // empty series, not a reject
    assert(fromJsonBody(spark, "{\"a\": null}").collect().isEmpty)
    // a valid body and the `{}` no-data body are unaffected
    val got = fromJsonBody(spark,
      "{\"t1\": {\"2020-01-01T00:00:00Z\": 1.5}}").collect()
    assert(got.length == 1 && got(0).getDouble(2) == 1.5)
    assert(fromJsonBody(spark, "{}").collect().isEmpty)
  }
}
