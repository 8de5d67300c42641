package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted character-trigram LM — q79's model as a warehouse
  * artifact: a quality-filtering pipeline trains the LM once per
  * reference-corpus refresh and scores every new document (batch or
  * stream) against it. Bounded vocabulary state (≤ |charset|³ rows of
  * (tri, micro_nats)) — broadcast-scale at any corpus size.
  *
  * Layout: `<storeDir>/trigram_lm` parquet. Lifecycle from
  * [[graft.store.PersistedStore]]. */
object LmStore extends graft.store.PersistedStore {

  /** Train on `<dir>/documents.parquet` — the exact q79 model. */
  def build(spark: SparkSession, dir: String, storeDir: String): Unit =
    TextOps.lmModel(
        spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$storeDir/trigram_lm")

  /** The model table. */
  def model(spark: SparkSession, storeDir: String): DataFrame =
    graft.store.PersistedStore.readTable(spark, s"$storeDir/trigram_lm")
}
