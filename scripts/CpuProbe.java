// Pure-ALU probe: per-thread throughput of a register-only xorshift loop at
// T threads. No memory traffic. If per-thread rate drops with T, the cores
// themselves slow down under load (frequency scaling / hypervisor caps).
public class CpuProbe {
  static volatile boolean stop = false;
  public static void main(String[] args) throws Exception {
    int threads = Integer.parseInt(args[0]);
    int seconds = args.length > 1 ? Integer.parseInt(args[1]) : 10;
    long[] counts = new long[threads];
    Thread[] ts = new Thread[threads];
    for (int t = 0; t < threads; t++) {
      final int id = t;
      ts[t] = new Thread(() -> {
        long x = 0x9E3779B97F4A7C15L * (id + 1), steps = 0;
        while (!stop) {
          for (int k = 0; k < 1 << 20; k++) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; }
          steps += 1 << 20;
        }
        counts[id] = steps | (x & 1); // keep x live
      });
      ts[t].start();
    }
    long t0 = System.nanoTime();
    Thread.sleep(seconds * 1000L);
    stop = true;
    for (Thread th : ts) th.join();
    double wall = (System.nanoTime() - t0) / 1e9;
    long total = 0; for (long c : counts) total += c;
    System.out.printf("threads=%d Msteps_per_sec=%.1f per_thread=%.1f%n",
      threads, total / wall / 1e6, total / wall / 1e6 / threads);
  }
}
