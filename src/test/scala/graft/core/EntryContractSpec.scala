package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract drift guard: every query must ship an oracle (the
  * correctness gate hash-checks only queries present in BOTH maps; a
  * missing oracle silently downgrades to a rows-only check). */
class EntryContractSpec extends AnyFunSuite {
  test("queries and oracleSql cover exactly the same names") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(q === o, s"only-query: ${q diff o}; only-oracle: ${o diff q}")
  }
}
