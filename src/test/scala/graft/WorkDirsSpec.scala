package graft

/** The shared-layout publication protocol (r11 verdict #2): builders race,
  * exactly one generation wins, nothing is ever rebuilt over a live dir. */
class WorkDirsSpec extends SparkSpec {

  private def newBase(): String =
    java.nio.file.Files.createTempDirectory("graft_pubtest_").toString + "/layout"

  test("racing builders both resolve the same published generation, no litter") {
    val base = newBase()
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        val p = WorkDirs.publishedLayout(base, "m1") { stage =>
          built.incrementAndGet()
          Thread.sleep(50) // widen the race window
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$stage/data.txt"), s"t$i".getBytes("UTF-8"))
        }
        results.add(p); ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(results.size === 4)
    assert(results.toArray.toSet.size === 1, "threads resolved different paths")
    val gen = results.peek()
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$gen/_graft_layout")), "UTF-8") === "m1")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$gen/data.txt")))
    // losers' staging dirs are gone
    val leftovers = new java.io.File(base).listFiles()
      .filter(_.getName.startsWith("stage-"))
    assert(leftovers.isEmpty, s"staging litter: ${leftovers.mkString(", ")}")
    // every thread that started building finished; at least one did
    assert(built.get() >= 1)
  }

  test("a published generation is reused, a changed manifest supersedes it") {
    val base = newBase()
    var builds = 0
    val p1 = WorkDirs.publishedLayout(base, "mA") { stage =>
      builds += 1
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$stage/a"), "a".getBytes("UTF-8"))
    }
    val p1again = WorkDirs.publishedLayout(base, "mA")(_ => builds += 1)
    assert(p1 === p1again)
    assert(builds === 1, "published generation was rebuilt")
    val p2 = WorkDirs.publishedLayout(base, "mB") { stage =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$stage/b"), "b".getBytes("UTF-8"))
    }
    assert(p2 !== p1)
    // the superseded generation was garbage-collected on publish
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p1)),
      "superseded generation not collected")
  }
}
