package graft

/** Scratch-directory root for query-local fixtures, sinks, and
  * checkpoints (the `target/graft_io` tree). Derived from the
  * `SPARK_GRAFT_SCRATCH` env var (the Bench `SPARK_GRAFT_BENCH_OUT`
  * pattern) so the repo location is not baked into the code; the
  * default keeps the historical path.
  *
  * Local-mode assumption, stated once: several fixtures write blobs or
  * sliced source files to this root from executor code (q95's
  * foreachPartition) or read it back as a streaming source — correct
  * under `local[*]` where driver and executors share a filesystem. On a
  * real cluster the root must point at shared storage (the env var),
  * exactly like any checkpoint location.
  */
object Scratch {
  val root: String =
    sys.env.getOrElse("SPARK_GRAFT_SCRATCH", "/root/repo/target/graft_io")

  /** `root`/`name` as a String path (convenience for query bodies). */
  def dir(name: String): String = s"$root/$name"

  /** Cheap content fingerprint of a local file tree: every regular
    * file's (relative name, size, mtime) PLUS the first, middle and
    * last 64 bytes of its content, and the overall file count, folded
    * into one string. Used by the idempotent-fixture markers (q75's
    * signature store, q95's blob store, q106's ANN index) so that
    * REGENERATING an input table in place — same path, new bytes —
    * invalidates the persisted derived state instead of silently
    * reusing it (a stale store would still fail the oracle, but as a
    * confusing engine-bug-shaped red row rather than a rebuild). The
    * content samples defeat metadata-preserving rewrites (cp -p,
    * rsync -t, a deterministic writer landing within mtime
    * granularity): for parquet the last bytes cover the footer, whose
    * row-group offsets and statistics shift under any content change;
    * the middle sample (ScratchSpec r9) additionally catches an
    * in-place payload edit that leaves both ends intact. Still
    * O(files) driver-side control flow with O(1) bytes read per
    * file — the same class as a checkpoint-directory existence
    * probe. */
  def fingerprint(path: String): String = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) "absent"
    else {
      val s = java.nio.file.Files.walk(p)
      try {
        val it = s.filter(java.nio.file.Files.isRegularFile(_))
          .sorted().iterator()
        var h = 1125899906842597L // large prime; stable across JVMs
        var nFiles = 0L
        def fold(bytes: Array[Byte], n: Int): Unit = {
          var i = 0
          while (i < n) { h = 31 * h + bytes(i); i += 1 }
        }
        while (it.hasNext) {
          val f = it.next()
          nFiles += 1
          val size = java.nio.file.Files.size(f)
          val line = s"${p.relativize(f)}:$size:" +
            s"${java.nio.file.Files.getLastModifiedTime(f).toMillis}:"
          for (c <- line) h = 31 * h + c
          val ch = java.nio.file.Files.newByteChannel(f)
          try {
            val buf = java.nio.ByteBuffer.allocate(64)
            val nHead = ch.read(buf)
            if (nHead > 0) fold(buf.array(), nHead)
            if (size > 128) {
              buf.clear()
              ch.position(size / 2 - 32)
              val nMid = ch.read(buf)
              if (nMid > 0) fold(buf.array(), nMid)
            }
            if (size > 64) {
              buf.clear()
              ch.position(math.max(0L, size - 64))
              val nTail = ch.read(buf)
              if (nTail > 0) fold(buf.array(), nTail)
            }
          } finally ch.close()
        }
        h = 31 * h + nFiles
        java.lang.Long.toHexString(h)
      } finally s.close()
    }
  }
}
