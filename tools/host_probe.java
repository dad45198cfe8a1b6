/**
 * Dev-only standalone host-regime sampler — the bench's three
 * sentinels (single-thread ALU spin, all-core ALU spin, all-core
 * memory-bandwidth stream) extracted into a 2-second probe so a
 * quiet window can be FOUND before committing a 30-120 min bench
 * leg to it, instead of discovered contaminated afterwards.
 * Mirrors graft.Bench exactly: 50M-step LCG spin; per-core private
 * 16 MB long array streamed 3x, min-of-3 after a warm pass.
 *
 * Usage: java tools/host_probe.java [reps]
 * Prints one JSON line per rep: {"spin_ms":..,"par_ms":..,"mem_ms":..}
 */
public class host_probe {
  static volatile long sink;

  static double spinMs() {
    long t0 = System.nanoTime();
    long x = 0x9E3779B97F4A7C15L;
    for (int i = 0; i < 50_000_000; i++) x = x * 6364136223846793005L + 1442695040888963407L;
    sink = x;
    return (System.nanoTime() - t0) / 1e6;
  }

  static double parMs() throws Exception {
    int n = Runtime.getRuntime().availableProcessors();
    var start = new java.util.concurrent.CountDownLatch(1);
    var done = new java.util.concurrent.CountDownLatch(n);
    for (int t = 0; t < n; t++) {
      Thread th = new Thread(() -> {
        try { start.await(); } catch (InterruptedException e) { return; }
        long x = 0x9E3779B97F4A7C15L;
        for (int i = 0; i < 50_000_000; i++) x = x * 6364136223846793005L + 1442695040888963407L;
        sink = x;
        done.countDown();
      });
      th.setDaemon(true); th.start();
    }
    long t0 = System.nanoTime();
    start.countDown(); done.await();
    return (System.nanoTime() - t0) / 1e6;
  }

  static double memMs() throws Exception {
    int n = Runtime.getRuntime().availableProcessors();
    var ready = new java.util.concurrent.CountDownLatch(n);
    var start = new java.util.concurrent.CountDownLatch(1);
    var done = new java.util.concurrent.CountDownLatch(n);
    for (int t = 0; t < n; t++) {
      Thread th = new Thread(() -> {
        long[] a = new long[2 * 1024 * 1024];
        for (int i = 0; i < a.length; i++) a[i] = i;
        ready.countDown();
        try { start.await(); } catch (InterruptedException e) { return; }
        long s = 0;
        for (int pass = 0; pass < 3; pass++)
          for (int j = 0; j < a.length; j++) s += a[j];
        sink = s;
        done.countDown();
      });
      th.setDaemon(true); th.start();
    }
    ready.await();
    long t0 = System.nanoTime();
    start.countDown(); done.await();
    return (System.nanoTime() - t0) / 1e6;
  }

  static double min3mem() throws Exception {
    memMs(); // warm pass (JIT + page faults), discarded
    return Math.min(memMs(), Math.min(memMs(), memMs()));
  }

  public static void main(String[] args) throws Exception {
    int reps = args.length > 0 ? Integer.parseInt(args[0]) : 1;
    spinMs(); parMs(); // JIT warm
    for (int r = 0; r < reps; r++) {
      double spin = Math.min(spinMs(), Math.min(spinMs(), spinMs()));
      double par = Math.min(parMs(), Math.min(parMs(), parMs()));
      double mem = min3mem();
      System.out.printf(java.util.Locale.ROOT,
        "{\"spin_ms\":%.1f,\"par_ms\":%.1f,\"mem_ms\":%.1f}%n", spin, par, mem);
    }
  }
}
