package graft.tools

/** Retires bench floors whose seeding predates the current operator
  * code — the floor-epoch tool (r19 verdict item 3).
  *
  * Usage: `runMain graft.tools.FloorRetire <tag> <query> [query...]`
  *
  * Every live `<namespace>/<query>` entry in BENCH_floor.json moves to
  * `<namespace>/<query>@retired-<tag>` — kept verbatim for history,
  * invisible to the bench's floorOf lookup and never re-tightened — so
  * the next clean window re-seeds the live key under the code that
  * actually runs. Run it in the round that touches an operator on the
  * query's path; a floor measured under different code is not a fair
  * regression denominator (the d04 pattern: a pre-guard 1.353 s floor
  * graded guard-era walls `weak` for two rounds).
  */
object FloorRetire {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: FloorRetire <tag> <query> [query...]")
    val tag = args.head
    require(tag.matches("[A-Za-z0-9._-]+"),
      s"tag must be a bare token (goes into floor keys), got '$tag'")
    val queries = args.tail.toSeq
    val before = graft.Bench.loadFloors()
    val after = graft.Bench.retireFloors(before, queries, tag)
    val moved = after.keySet.diff(before.keySet)
    graft.Bench.saveFloors(after)
    println(s"retired ${moved.size} floor(s) under tag '$tag':")
    moved.toSeq.sorted.foreach { k =>
      println(f"  $k = ${after(k)}%.3f")
    }
    if (moved.isEmpty)
      println("  (no live floors matched — already retired or never seeded)")
  }
}
