package graft.sources

import org.apache.spark.sql.SparkSession

/** Managed-table write hygiene shared by every graft index/layout writer. */
object ManagedTables {

  /** Make `tableName` writable by `saveAsTable`: if the session catalog does
    * NOT know the table but its managed location survives on disk (a prior
    * JVM wrote it — in-memory catalogs forget their tables at exit, warehouse
    * directories don't), delete the orphaned directory. Spark refuses to
    * create a managed table over an existing location
    * (`LOCATION_ALREADY_EXISTS`), and the data there is unreachable by
    * definition — no catalog entry points at it. Catalog-known tables are
    * left alone; `mode("overwrite")` replaces those through the catalog. */
  def clearOrphanedLocation(spark: SparkSession, tableName: String): Unit = {
    require(!tableName.contains("."),
      s"simple (default-database) table names only, got $tableName")
    // The existence check MUST be against the qualified default-db name: the
    // unqualified form resolves against the CURRENT database (and is shadowed
    // by temp views), so with a non-default current database a live
    // default-db table would look absent here while the path below is the
    // default-db layout — and we'd delete registered data.
    if (!spark.catalog.tableExists("default." + tableName)) {
      val dbLoc = spark.catalog.getDatabase("default").locationUri
      val p = new org.apache.hadoop.fs.Path(
        dbLoc, tableName.toLowerCase(java.util.Locale.ROOT))
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
  }
}
