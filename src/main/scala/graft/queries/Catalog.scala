package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query (SURVEY.md §2C): a Spark DataFrame
  * implementation plus, where SQL-expressible, a DuckDB oracle query that
  * must hash-match it row-for-row (driver gate t2).
  *
  * Determinism contract (SURVEY §2C rules): every query ends in a total
  * ORDER BY over a unique key set; every float aggregate is ROUND(x, 4) on
  * both sides; counts are BIGINT on both sides; event timestamps are
  * compared as BIGINT microseconds (see [[graft.Tables.events]]).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Scratch directories for queries that persist artifacts mid-query (ANN
  * indexes, JSONL shards). Paths are pid-suffixed so two concurrent JVMs
  * cannot race one overwrite path, and every handed-out path is deleted
  * recursively on JVM exit so repeated driver runs do not accumulate
  * encoded copies of the tables in /tmp. [[once]] guards per-JVM builds
  * with an IN-MEMORY set, not a filesystem marker: a marker would let a
  * recycled pid trust a stale directory left by a crashed run or built
  * from an older version of the dataset.
  */
object Scratch {
  private val built = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val issued = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      issued.forEach { p =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(p))
      }))
  }

  /** Stable within one JVM for a (kind, dataset dir) pair. unsigned-hex
    * hash, not math.abs: abs(Int.MinValue) is negative.
    */
  def path(kind: String, dir: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_" +
      s"${java.lang.Integer.toUnsignedString(dir.hashCode, 16)}" +
      s"_p${ProcessHandle.current().pid()}"
    issued.add(p)
    p
  }

  /** Run `build` only the first time this JVM sees `key`; a build that
    * throws is forgotten so the next call retries instead of trusting a
    * half-written artifact.
    */
  def once(key: String)(build: => Unit): Unit =
    if (built.add(key)) {
      try build
      catch { case t: Throwable => built.remove(key); throw t }
    }
}

object Catalog {
  val all: Seq[QueryDef] = {
    val defs =
      Relational.defs ++ Analytics.defs ++ TextPipeline.defs ++ Dedup.defs ++
        StreamParity.defs ++ Media.defs ++ SqlEntry.defs ++ ScalePaths.defs ++
        Curation.defs ++ TimeSeries.defs ++ Classifier.defs ++ Tokenizer.defs ++
        Reporting.defs ++ BudgetSelect.defs ++ Coreset.defs ++ Clustering.defs ++ Mixture.defs ++ HardNegatives.defs ++
        RetrievalEval.defs ++ UnigramTok.defs ++ QualitySignals.defs ++
        CurationPipeline.defs ++ SftPrep.defs
    // a duplicated name would silently SHADOW a query in the Maps below —
    // the driver would then verify one query twice and the other never
    val dups = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names in Catalog: ${dups.mkString(", ")}")
    defs
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap
  lazy val oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
