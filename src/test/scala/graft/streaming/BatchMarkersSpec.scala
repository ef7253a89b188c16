package graft.streaming

import org.apache.hadoop.fs.Path

/** [[BatchMarkers]] — the shared per-batch idempotence markers of the
  * streaming sinks must stay BOUNDED for the stream's whole life
  * (without pruning a 10 s trigger leaks 8 640 marker files per day).
  */
class BatchMarkersSpec extends graft.SparkSpec {

  test("commit writes the marker and prunes the dead tail; foreign files survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_markers").toString + "/_b"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L to 5L).foreach(i => BatchMarkers.commit(fs, dir, i, retain = 3))
    // after batch 5 with retain 3, ids ≤ 2 are dead
    val names = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.startsWith("batch-")).sorted.toSeq
    assert(names == Seq("batch-3", "batch-4", "batch-5"),
      s"dir must hold exactly the retained tail: $names")
    assert(BatchMarkers.exists(fs, dir, 5) && !BatchMarkers.exists(fs, dir, 0))
    // a non-marker file in the dir is never touched
    fs.create(new Path(dir, "not-a-marker")).close()
    BatchMarkers.commit(fs, dir, 6, retain = 3)
    assert(fs.exists(new Path(dir, "not-a-marker")))
    assert(!BatchMarkers.exists(fs, dir, 3))
  }
}
