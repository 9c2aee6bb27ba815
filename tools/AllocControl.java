import java.util.concurrent.*;

/** Allocation-heavy JVM scaling control: fixed total work of building short
 * strings + arrays (kept briefly live in a ring to defeat scalar replacement),
 * measured at 2 vs 8 threads. Approximates the memory-subsystem behavior of a
 * row-pipeline engine far better than an ALU-bound hash loop. */
public class AllocControl {
    static long unit(int iters) {
        Object[] ring = new Object[512];
        long acc = 0;
        for (int i = 0; i < iters; i++) {
            String s = "mention-" + (i & 0xfffff) + "-" + ((i * 31) & 0xffff);
            int[] arr = new int[12];
            for (int k = 0; k < 12; k++) arr[k] = s.length() + k;
            ring[i & 511] = new Object[]{s, arr};
            acc += s.hashCode() + arr[7];
        }
        return acc;
    }
    public static void main(String[] args) throws Exception {
        int threads = Integer.parseInt(args[0]);
        long total = 160_000_000L;
        int per = (int)(total / threads);
        // warmup
        unit(2_000_000);
        ExecutorService ex = Executors.newFixedThreadPool(threads);
        long t0 = System.nanoTime();
        Future<?>[] fs = new Future<?>[threads];
        for (int t = 0; t < threads; t++) fs[t] = ex.submit(() -> unit(per));
        for (Future<?> f : fs) f.get();
        double sec = (System.nanoTime() - t0) / 1e9;
        ex.shutdown();
        System.out.printf("{\"threads\":%d,\"sec\":%.2f,\"ops_per_sec\":%.0f}%n",
            threads, sec, total / sec);
    }
}
