package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{SignatureStore, TextOps}

/** The persisted signature store: pairs from the store equal pairs
  * computed fresh from text, and the gate's store read prunes the
  * heavy shingle-set column. */
class SignatureStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"

  test("store-served candidate pairs equal the text-computed gate") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft-sigstore").toString
    SignatureStore.build(spark, dir, store)
    val fromStore = SignatureStore.candidatePairs(spark, store)
      .as[(Long, Long)].collect().toSet
    val fresh = TextOps.lshCandidatePairsUncached(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(fromStore === fresh)
    assert(fromStore.nonEmpty)

    // the gate must not read the ss (shingle-set) column: ReadSchema
    // of the signatures scan carries mh_* but not ss
    val plan = SignatureStore.candidatePairs(spark, store)
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(readSchema.contains("mh_0"), readSchema)
    assert(!readSchema.contains("ss"), s"gate reads the set column:\n$readSchema")

    // and the stored table really carries the re-rank sets
    val sig = SignatureStore.signatures(spark, store)
    assert(sig.columns.contains("ss") && sig.columns.contains("mh_31"))
    assert(sig.count() === spark.read.parquet(s"$dir/documents.parquet").count())
  }
}
