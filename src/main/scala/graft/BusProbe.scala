package graft

/** Spark-free scaling probe for the sandbox host — quantifies the ceiling
  * each RESOURCE class imposes on an N→4N core-scaling pair, so the suite
  * pairs in BENCH/BASELINE.md can be decomposed against hardware rather
  * than hand-waved. Three workloads, 8 vs 32 threads, fixed wall budget:
  *
  *   alu   — register-only LCG chain: pure compute, no memory traffic.
  *   read  — dependent random reads over 64 MB/thread: DRAM latency.
  *   alloc — allocate + copy ~660 B per op: memory WRITE bandwidth +
  *           allocator/GC — the regime Spark row processing (UnsafeRow
  *           materialization, UTF8String copies, agg buffers) lives in.
  *
  * Round-5 measurements on this host: alu 0.97, read 0.77, alloc 0.37
  * efficiency — i.e. the box's ~12 GB/s write path saturates near 8
  * threads, and NO allocation-heavy workload can scale 8→32 cores here
  * regardless of plan quality. A real 4N-executor cluster multiplies
  * memory buses with executors; this single box does not.
  */
object BusProbe {
  @volatile private var sink: AnyRef = _
  @volatile private var sinkL: Long = _

  private def run(mode: String, threads: Int, seconds: Int): Double = {
    val deadline = System.nanoTime() + seconds * 1000000000L
    val iters = new Array[Long](threads)
    val ths = (0 until threads).map { id =>
      new Thread(() => {
        mode match {
          case "alu" =>
            var x = id + 1L; var c = 0L
            while (System.nanoTime() < deadline) {
              var k = 0
              while (k < 100000) { x = x * 6364136223846793005L + 1442695040888963407L; k += 1 }
              c += 100000
            }
            sinkL = x; iters(id) = c
          case "read" =>
            val arr = new Array[Long](8 * 1024 * 1024) // 64 MB
            var k = 0
            while (k < arr.length) { arr(k) = k * 0x9E3779B97F4A7C15L; k += 1 }
            var x = 0L; var idx = id; var c = 0L
            while (System.nanoTime() < deadline) {
              var j = 0
              while (j < 100000) {
                idx = ((idx * 0x9E3779B97F4A7C15L >>> 40) & (arr.length - 1)).toInt
                x += arr(idx); j += 1
              }
              c += 100000
            }
            sinkL = x; iters(id) = c
          case "alloc" =>
            val src = new Array[Byte](600)
            var x = id.toLong; var c = 0L
            while (System.nanoTime() < deadline) {
              var k = 0
              while (k < 1000) {
                val b = new Array[Byte](600)
                System.arraycopy(src, 0, b, 0, 600)
                val d = new Array[Byte](64)
                var j = 0
                while (j < 64) { d(j) = (b(j * 9) ^ x).toByte; j += 1 }
                sink = d
                x = x * 6364136223846793005L + 1
                k += 1
              }
              c += 1000
            }
            iters(id) = c
        }
      })
    }
    ths.foreach(_.start()); ths.foreach(_.join())
    iters.sum.toDouble / seconds
  }

  def main(args: Array[String]): Unit = {
    val seconds = sys.env.getOrElse("PROBE_SECONDS", "8").toInt
    val lo = sys.env.getOrElse("PROBE_N", "8").toInt
    val hi = lo * 4
    Seq("alu", "read", "alloc").foreach { mode =>
      run(mode, 2, 2) // JIT warmup
      val a = run(mode, lo, seconds)
      val b = run(mode, hi, seconds)
      val eff = b / (4.0 * a)
      println(f"""{"metric":"bus probe","mode":"$mode","n":$lo,"n4":$hi,""" +
        f""""ops_per_sec_n":${a}%.0f,"ops_per_sec_4n":${b}%.0f,""" +
        f""""efficiency":${eff}%.3f}""")
    }
  }
}
