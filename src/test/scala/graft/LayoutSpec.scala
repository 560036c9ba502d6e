package graft

/** The write-once contract every persisted-layout oracle leans on:
  * one materialization per (session run, dataset) no matter how many
  * queries touch the layout, and `lastPath` always naming the layout
  * the most recent query used (what the dataset-less oracle SQL reads).
  */
class LayoutSpec extends SparkSpec {

  test("Layout materializes once per dataset and tracks lastPath") {
    val l = new Layout("graft_layout_spec")
    var writes = 0
    val p1 = l(spark, "dsA") { p => writes += 1; new java.io.File(p).mkdirs() }
    val p2 = l(spark, "dsA") { _ => writes += 1 }
    assert(writes === 1, "second touch must not re-materialize")
    assert(p1 === p2)
    assert(l.lastPath === p1)
    val p3 = l(spark, "dsB") { _ => writes += 1 }
    assert(writes === 2)
    assert(p3 !== p1, "datasets must not share a layout path")
    assert(l.lastPath === p3, "lastPath must follow the most recent touch")
    l(spark, "dsA") { _ => writes += 1 }
    assert(writes === 2)
    assert(l.lastPath === p1)
  }
}
