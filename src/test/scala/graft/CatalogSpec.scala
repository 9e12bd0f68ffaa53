package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards for the query catalog — cheap structural checks
  * that would otherwise only fail inside the driver's gate.
  */
class CatalogSpec extends AnyFunSuite {

  test("query names are unique across all def groups") {
    val names = graft.queries.Catalog.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }

  test("every oracle key has a matching query and a total ORDER BY") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(qs.contains(name), s"oracle for undeclared query $name")
      assert(sql.toUpperCase.contains("ORDER BY"),
        s"$name oracle lacks the deterministic ORDER BY the hash compare needs")
    }
  }

  test("query names follow the qNN_ naming convention") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("q\\d{2,3}_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming names: $bad")
  }
}
