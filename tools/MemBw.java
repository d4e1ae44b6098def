/**
 * STREAM-style DRAM bandwidth probe for the scaling analysis in BENCH.md
 * (round 6: quantify the Job C banding-stage ceiling against a measured
 * memory-bus number — the box's CPU model string is masked, so the spec
 * cannot be looked up; measure instead).
 *
 * Each thread streams a private array far larger than LLC with a
 * copy-scale kernel (read a[i], write b[i]): 16 bytes of DRAM traffic
 * per element. Reports aggregate GB/s. Run pinned, e.g.:
 *   taskset -c 0-7  java MemBw 8
 *   taskset -c 0-31 java MemBw 32
 */
public final class MemBw {
  // Per-thread, CONSTANT across thread counts (so the 32-thread run is
  // not flattered by arrays shrinking into LLC): 32M longs = 256 MB src
  // + 256 MB dst per thread.
  static final int ELEMS = 1 << 25;

  public static void main(String[] args) throws Exception {
    int threads = Integer.parseInt(args[0]);
    int reps = args.length > 1 ? Integer.parseInt(args[1]) : 3;
    long[][] src = new long[threads][];
    long[][] dst = new long[threads][];
    for (int t = 0; t < threads; t++) {
      src[t] = new long[ELEMS];
      dst[t] = new long[ELEMS];
      java.util.Arrays.fill(src[t], t + 1);
    }
    double best = 0;
    for (int r = 0; r < reps + 1; r++) { // rep 0 = warm-up
      Thread[] ts = new Thread[threads];
      long t0 = System.nanoTime();
      for (int t = 0; t < threads; t++) {
        final int id = t;
        ts[t] = new Thread(() -> {
          long[] a = src[id], b = dst[id];
          for (int pass = 0; pass < 4; pass++)
            for (int i = 0; i < a.length; i++) b[i] = a[i] * 3 + pass;
        });
        ts[t].start();
      }
      for (Thread th : ts) th.join();
      double sec = (System.nanoTime() - t0) / 1e9;
      // 4 passes, 16 B/elem, per thread
      double bytes = 4.0 * 16 * ELEMS * threads;
      double gbps = bytes / sec / 1e9;
      if (r > 0 && gbps > best) best = gbps;
    }
    System.out.println("{\"threads\":" + threads
        + ",\"copy_scale_gbps\":" + Math.rint(best * 10) / 10 + "}");
  }
}
