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
    // r12 verdict #1: a sibling generation is a live VARIANT, not
    // superseded history — publishing mB must NOT delete mA's generation
    // (a concurrent JVM may be mid-scan on it).
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$p1/a")),
      "live sibling variant was garbage-collected at publish")
  }

  test("racing publishers of DIFFERENT variants both stay live") {
    // The exact r12 collision: one JVM builds maxRows=2000, another the
    // default 50000 — different manifests, same base. Whoever publishes
    // second must not reclaim the other's generation.
    val base = newBase()
    val paths = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val threads = Seq("variant-2000", "variant-50000").map { m =>
      new Thread(() => {
        val p = WorkDirs.publishedLayout(base, m) { stage =>
          Thread.sleep(50) // widen the race window
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$stage/data.txt"), m.getBytes("UTF-8"))
        }
        paths.put(m, p); ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(paths.size === 2)
    Seq("variant-2000", "variant-50000").foreach { m =>
      val p = paths.get(m)
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$p/data.txt")), "UTF-8") === m,
        s"variant $m torn by its sibling's publish")
    }
    // re-resolving either variant reuses it without a rebuild
    var rebuilt = false
    val again = WorkDirs.publishedLayout(base, "variant-2000")(_ => rebuilt = true)
    assert(again === paths.get("variant-2000") && !rebuilt)
  }

  test("a stale sibling (older than sweepAgeMs) is reclaimed on publish") {
    val base = newBase()
    val p1 = WorkDirs.publishedLayout(base, "old") { stage =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$stage/a"), "a".getBytes("UTF-8"))
    }
    // backdate the generation past the sweep window
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(p1),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - WorkDirs.sweepAgeMs - 60000))
    val p2 = WorkDirs.publishedLayout(base, "new") { stage =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$stage/b"), "b".getBytes("UTF-8"))
    }
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$p2/b")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p1)),
      "stale generation survived the sweep")
    // ...but resolving a variant refreshes its mtime, shielding it
    val p3 = WorkDirs.publishedLayout(base, "new")(_ => ())
    assert(p3 === p2)
    val mt = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(p2)).toMillis
    assert(System.currentTimeMillis() - mt < 60000,
      "resolution did not refresh the generation's mtime")
  }

  test("bench canary baseline parser reads last round's detail line (r14 verdict #5)") {
    // the shape Bench itself writes: queries object + top-level canary
    val detail = """{"metric":"total_detail","value":176.042,"unit":"sec",""" +
      """"queries":{"q01_scan_project":0.061,"q33_pipeline_e2e":4.271},""" +
      """"spread":{"q01_scan_project":0.01},"canary":1.234,"sf":"x"}"""
    val (qs, canary) = Bench.parsePrevDetail(detail)
    assert(qs === Map("q01_scan_project" -> 0.061,
      "q33_pipeline_e2e" -> 4.271))
    assert(canary === Some(1.234))
    // pre-canary rounds (r14 and earlier) parse with no canary — the
    // normalizer then reports nothing instead of guessing
    val old = """{"metric":"total_detail","value":1.0,""" +
      """"queries":{"q01_scan_project":0.5},"sf":"x"}"""
    val (qs2, c2) = Bench.parsePrevDetail(old)
    assert(qs2 === Map("q01_scan_project" -> 0.5) && c2.isEmpty)
    // garbage stays harmless
    assert(Bench.parsePrevDetail("not json") === (Map.empty, None))
  }
}
