package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.sources.ClaimFile

/** The claim primitive behind the sync lease and the schema-log
  * version claim. The property under test is the one the round-15
  * sync-race spec caught failing ~1-in-3 before the O_EXCL fix: a
  * token-verify-only claim is not linearizable on the local FS (two
  * racers interleave create/write/close and each re-reads at a
  * different instant — both see their own token), so N simultaneous
  * claimers could admit MORE than one writer.
  */
class ClaimFileSpec extends SparkSpec {

  test("tryClaim admits exactly one of N simultaneous racers, every round") {
    import scala.concurrent._
    import scala.concurrent.duration._
    import ExecutionContext.Implicits.global
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = Files.createTempDirectory("graft_claim").toString
    (1 to 40).foreach { round =>
      val claim = new Path(s"$dir/claim_$round")
      val gate = new java.util.concurrent.CountDownLatch(1)
      val racers = (1 to 8).map { i =>
        Future { gate.await(); ClaimFile.tryClaim(fs, claim, s"tok-$round-$i") }
      }
      gate.countDown()
      val got = Await.result(Future.sequence(racers), 60.seconds)
      assert(got.count(identity) == 1,
        s"round $round admitted ${got.count(identity)} writers (must be exactly 1)")
    }
  }

  test("per-scheme strategy seam: a registered strategy overrides the built-in and is removable") {
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = Files.createTempDirectory("graft_claim3").toString
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    // a counting wrapper around the O_EXCL semantics — the seam a
    // conditional-PUT object-store binding would plug into
    ClaimFile.register("file", (_, claim, bytes) => {
      calls.incrementAndGet()
      val p = java.nio.file.Paths.get(claim.toUri.getPath)
      try {
        java.nio.file.Files.createFile(p)
        java.nio.file.Files.write(p, bytes)
        true
      } catch { case _: java.io.IOException => false }
    })
    try {
      val claim = new Path(s"$dir/claim")
      assert(ClaimFile.tryClaim(fs, claim, "alpha"))
      assert(calls.get() == 1, "the registered strategy must be the one that ran")
      // losing path still goes through the strategy; token verify holds
      assert(!ClaimFile.tryClaim(fs, claim, "beta"))
      assert(calls.get() == 2)
    } finally ClaimFile.unregister("file")
    // built-in restored: claims still work
    val claim2 = new Path(s"$dir/claim2")
    assert(ClaimFile.tryClaim(fs, claim2, "gamma"))
  }

  test("tryClaim: an existing claim refuses; released claim reclaims; content survives") {
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = Files.createTempDirectory("graft_claim2").toString
    val claim = new Path(s"$dir/claim")
    assert(ClaimFile.tryClaim(fs, claim, "alpha"))
    // the holder's token is what survives on disk
    val in = fs.open(claim)
    val content = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(content == "alpha")
    // a later claimer must lose against the live claim — and must NOT
    // disturb the holder's token (the exists-then-create overwrite was
    // exactly the pre-fix corruption)
    assert(!ClaimFile.tryClaim(fs, claim, "beta"))
    val in2 = fs.open(claim)
    val content2 = try new String(in2.readAllBytes(), "UTF-8") finally in2.close()
    assert(content2 == "alpha", "a losing claim must not clobber the holder's token")
    // release → the next claim wins
    fs.delete(claim, false)
    assert(ClaimFile.tryClaim(fs, claim, "gamma"))
  }

  test("release is rename-aside: a match deletes, a mismatch restores the live claim, no residue") {
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = Files.createTempDirectory("graft_claim4").toString
    def residue(): Seq[String] =
      fs.listStatus(new Path(dir)).toSeq.map(_.getPath.getName)
        .filter(_.contains(".reclaim_"))
    val claim = new Path(s"$dir/claim")
    // matching release removes the claim and leaves no aside residue
    assert(ClaimFile.tryClaim(fs, claim, "alpha"))
    ClaimFile.release(fs, claim, "alpha")
    assert(!fs.exists(claim), "a matching release must remove the claim")
    assert(residue().isEmpty, s"matching release left residue: ${residue()}")
    // the stalled-ex-holder path: the claim was reclaimed (fresh
    // holder's token on disk) — the stale release must leave the LIVE
    // claim at its path, content intact, and no residue
    assert(ClaimFile.tryClaim(fs, claim, "beta"))
    ClaimFile.release(fs, claim, "alpha")
    assert(fs.exists(claim), "a stale release must not remove the live claim")
    val in = fs.open(claim)
    val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(got == "beta", "the live holder's token must survive a stale release")
    assert(residue().isEmpty, s"stale release left residue: ${residue()}")
  }

  test("stalled ex-holders releasing never unseat the live holder under concurrency") {
    import scala.concurrent._
    import scala.concurrent.duration._
    import ExecutionContext.Implicits.global
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = Files.createTempDirectory("graft_claim5").toString
    (1 to 25).foreach { round =>
      val claim = new Path(s"$dir/claim_$round")
      assert(ClaimFile.tryClaim(fs, claim, s"live-$round"))
      val gate = new java.util.concurrent.CountDownLatch(1)
      // four stalled ex-holders release stale tokens while two fresh
      // claimers probe — the live claim must survive all of it
      val releases = (1 to 4).map { i =>
        Future { gate.await(); ClaimFile.release(fs, claim, s"stale-$round-$i") }
      }
      val probes = (1 to 2).map { i =>
        Future { gate.await(); ClaimFile.tryClaim(fs, claim, s"probe-$round-$i") }
      }
      gate.countDown()
      Await.result(Future.sequence(releases), 30.seconds)
      val probeWins = Await.result(Future.sequence(probes), 30.seconds)
      assert(probeWins.forall(!_),
        s"round $round: a probe claimed while the live holder held")
      val in = fs.open(claim)
      val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      assert(got == s"live-$round",
        s"round $round: live token lost — found '$got'")
    }
  }
}
