// Spark-free host probe: how well does THIS box scale hash-style
// RANDOM-ACCESS memory work from T to 4T concurrent processes/threads?
// The round-2 probe (concurrent bulk copies) measured SEQUENTIAL bandwidth
// and showed ideal 2->8 scaling; hash joins / hash aggs / shuffle hash maps
// are latency-bound scattered access, which shares the memory subsystem
// differently. Each thread owns a private 512 MB long[] and performs a
// dependent pseudo-random walk with a scatter update (read-modify-write at
// a random slot) - the access pattern of a hash-aggregate probe/update.
// Usage: java MemProbe <threads> <seconds> [indep]  -> prints total Msteps/s.
// Third arg "indep" switches to INDEPENDENT scattered updates (no dependent
// chain): the CPU's out-of-order window keeps many cache misses in flight,
// so this mode is memory-THROUGHPUT-bound under concurrency - the regime of
// a whole-stage-codegen hash-aggregate chewing millions of rows/s - while
// the default dependent walk is latency-bound (one miss in flight/thread)
// and barely degrades with added threads. The two modes bracket the host.
public class MemProbe {
  static volatile boolean stop = false;
  static final java.util.concurrent.CountDownLatch ready =
      new java.util.concurrent.CountDownLatch(1);
  public static void main(String[] args) throws Exception {
    final int threads = Integer.parseInt(args[0]);
    final int seconds = args.length > 1 ? Integer.parseInt(args[1]) : 20;
    final boolean indep = args.length > 2 && args[2].equals("indep");
    // 4th arg: per-thread working set in MB (default 512). Small sets
    // (8-64 MB) probe the SHARED-L3 regime: T threads x W MB fit the last
    // level cache at low T and thrash it at high T - the regime of a
    // hash-agg whose hot map region is cache-resident at 2-way concurrency.
    final int mb = args.length > 3 ? Integer.parseInt(args[3]) : 512;
    final long[] counts = new long[threads];
    Thread[] ts = new Thread[threads];
    final java.util.concurrent.CountDownLatch inited =
        new java.util.concurrent.CountDownLatch(threads);
    for (int t = 0; t < threads; t++) {
      final int id = t;
      ts[t] = new Thread(() -> {
        final int n = mb * 128 * 1024; // mb MB of longs per thread
        final long[] a = new long[n];
        java.util.Random r = new java.util.Random(42 + id);
        for (int i = 0; i < n; i++) a[i] = r.nextInt(n);
        inited.countDown();
        try { ready.await(); } catch (InterruptedException e) { return; }
        long steps = 0;
        int idx = id;
        long x = 0x9E3779B97F4A7C15L * (id + 1);
        while (!stop) {
          if (indep) {
            for (int k = 0; k < 1 << 16; k++) {
              // independent scatter read-modify-writes: no serialization
              // between iterations, so misses overlap (throughput regime)
              x ^= x << 13; x ^= x >>> 7; x ^= x << 17;
              int j = (int) ((x & 0x7FFFFFFFFFFFFFFFL) % n);
              a[j] = a[j] + 1;
            }
          } else {
            for (int k = 0; k < 1 << 16; k++) {
              idx = (int) a[idx];            // dependent random read
              x ^= x << 13; x ^= x >>> 7; x ^= x << 17;
              int j = (int) ((x & 0x7FFFFFFFFFFFFFFFL) % n);
              a[j] = (a[j] + idx) % n;       // scatter update
            }
          }
          steps += 1 << 16;
        }
        counts[id] = steps;
      });
      ts[t].start();
    }
    inited.await(); // every thread allocated+initialized before the clock
    long t0 = System.nanoTime();
    ready.countDown();
    Thread.sleep(seconds * 1000L);
    stop = true;
    for (Thread th : ts) th.join();
    double wall = (System.nanoTime() - t0) / 1e9;
    long total = 0; for (long c : counts) total += c;
    System.out.printf("threads=%d Msteps_per_sec=%.1f%n", threads, total / wall / 1e6);
  }
}
