package graft.collab

import graft.SparkSpec

/** The connector jar is intentionally absent here (zero-egress env); this
  * spec pins the seam: the backend compiles, plugs into the TableStore
  * interface, and fails fast with the unresolved-data-source error rather
  * than something cryptic. On a cluster with the connector, the same
  * object is a drop-in ParquetTableStore replacement. */
class CassandraTableStoreSpec extends SparkSpec {

  test("connector-less environment fails fast with a clear resolution error") {
    val store: TableStore = new CassandraTableStore(spark, Schemas.Keyspace)
    store.create(Schemas.RatingsTable, Schemas.ratingSchema)
    val ex = intercept[Exception] {
      store.scan(Schemas.RatingsTable).count()
    }
    assert(ex.getMessage.toLowerCase.contains("failed to find")
      || ex.getMessage.contains("org.apache.spark.sql.cassandra"),
      s"expected data-source resolution error, got: ${ex.getMessage.take(120)}")
  }

  test("unknown table truncate is rejected before any connector call") {
    val store = new CassandraTableStore(spark, Schemas.Keyspace)
    intercept[IllegalStateException] { store.truncate("nope") }
  }
}
