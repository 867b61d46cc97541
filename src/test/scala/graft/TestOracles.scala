package graft

/** Driver-side reference implementations shared by specs — one
  * definition per oracle, so parity tests in different suites cannot
  * silently diverge. */
object TestOracles {

  /** Path-compressed union-find with union-by-min: returns every id
    * that appears in `edges` mapped to the SMALLEST id reachable from
    * it — the exact contract of Dedup.connectedComponents (self-loops
    * register the node; the min root always survives a union, so the
    * final root is the component minimum). */
  def unionFind(edges: Iterable[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }
}
