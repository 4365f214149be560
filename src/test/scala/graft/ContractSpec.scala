package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, MapType}
import org.scalatest.funsuite.AnyFunSuite

/** Guards on the SparkEntry driver contract itself.
  *
  * Scala Map literals silently keep only the LAST binding for a
  * duplicated key, so a query accidentally defined twice (or an oracle
  * added for an already-oracled name) never fails compilation — the
  * engine and the oracle can silently resolve to DIFFERENT entries.
  * The source-scan test makes that a hard failure.
  *
  * The driver-compat test guards the OTHER harness contract: the graded
  * compare loads both result sets into pandas and row-sorts them, which
  * crashes on array/map cells (unhashable ndarray) — three round-4 rows
  * (q_random_project, stream_latest_k, stream_type_counts) errored for
  * exactly this. Its sibling defect class — DuckDB HUGEINT from an
  * uncast sum() hashing as pandas float64 `20000.0` against Spark's
  * `20000` — needs DuckDB+pandas to detect and is gated by
  * tools/oracle_check.py's driver-compat lint (dtype-drift + sort
  * checks), run per round over the full Verify output.
  */
class ContractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-contract-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("driver-compat: no query emits a top-level array/map column") {
    val sf = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, f) =>
        f(spark, sf).schema.fields.collect {
          case fd if fd.dataType.isInstanceOf[ArrayType] ||
            fd.dataType.isInstanceOf[MapType] =>
            s"$name.${fd.name}: ${fd.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"array/map outputs crash the driver's pandas row-sort: $offenders")
  }

  test("filtered Verify dumps span fixtures exactly when a selected oracle needs them") {
    // unfiltered: always dump
    assert(Verify.needsFixtureDump(None))
    // extract oracles reconstruct from the dumped {OUT}/spans_* tables
    assert(Verify.needsFixtureDump(Some(Set("extract_e1_spans"))))
    assert(Verify.needsFixtureDump(Some(Set("q_sha2", "extract_e2_adv"))))
    // pure-table oracles must not trigger the (expensive) fixture dump
    assert(!Verify.needsFixtureDump(Some(Set("q_sha2", "q_filter_word"))))
  }

  test("every query has exactly one oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    // the two span-input identity oracles are oracle-only by design:
    // graft.Verify dumps those tables directly, not via a query
    val o = SparkEntry.oracleSql.keySet -- Set("spans_input", "spans_adv_input")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
  }

  test("no silently-overridden duplicate keys in the SparkEntry maps") {
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala"))
    val entry = """(?m)^    "([A-Za-z0-9_]+)" ->""".r
    val counts = entry.findAllMatchIn(src).map(_.group(1)).toSeq
      .groupBy(identity).view.mapValues(_.size)
    // each name may appear at most twice: once in queries, once in
    // oracleSql; a third occurrence means one map holds a duplicate
    // binding that Scala dropped silently
    val dups = counts.filter(_._2 > 2).keys.toSeq.sorted
    assert(dups.isEmpty, s"duplicate map keys (silent override): $dups")
    // and every parsed name must actually have survived into the maps
    val known = SparkEntry.queries.keySet ++ SparkEntry.oracleSql.keySet
    val lost = counts.keys.filterNot(known).toSeq.sorted
    assert(lost.isEmpty, s"map-entry-shaped keys not present in either map: $lost")
  }
}
