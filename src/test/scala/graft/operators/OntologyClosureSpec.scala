package graft.operators

import graft.SparkSpec

class OntologyClosureSpec extends SparkSpec {

  import spark.implicits._

  test("transitive closure finds all ancestors over a DAG") {
    //      R
    //     / \
    //    A   B
    //   / \ /
    //  C   D     (D has two parents)
    val edges = Seq(
      ("A", "R"), ("B", "R"), ("C", "A"), ("D", "A"), ("D", "B")
    ).toDF("child", "parent")
    val got = OntologyClosure.transitiveClosure(edges)
      .as[(String, String)].collect().toSet
    assert(got === Set(
      ("A", "R"), ("B", "R"),
      ("C", "A"), ("C", "R"),
      ("D", "A"), ("D", "B"), ("D", "R")))
  }

  test("ancestor and descendant set aggregation") {
    val edges = Seq(("C", "A"), ("A", "R")).toDF("child", "parent")
    val anc = OntologyClosure.ancestors(edges)
      .as[(String, Seq[String])].collect().toMap
    assert(anc("C").toSet === Set("A", "R"))
    assert(anc("A").toSet === Set("R"))
    val desc = OntologyClosure.descendants(edges)
      .as[(String, Seq[String])].collect().toMap
    assert(desc("R").toSet === Set("A", "C"))
    assert(desc("A").toSet === Set("C"))
  }

  test("deep chain converges within the depth bound") {
    val n = 40
    val edges = (1 until n).map(i => (s"n$i", s"n${i + 1}")).toDF("child", "parent")
    val closure = OntologyClosure.transitiveClosure(edges)
    // node 1 reaches all 39 ancestors
    assert(closure.filter("node = 'n1'").count() === (n - 1))
    assert(closure.count() === (n.toLong * (n - 1)) / 2)
  }
}
