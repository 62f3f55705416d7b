"""Quick machine-health probe for measurement eligibility (r13).

Round 13 found a new machine-state failure mode beyond CPU steal
(SCALE.md §15): transient page-fault latency of 30-1000x normal
(736 us/page measured vs ~1-3 us healthy), which degrades Spark
executors (allocation-heavy) 10-70x while plain CPU loops stay fast.
This probe measures both axes in ~2s with no Spark session:

  - cpu:   single-thread integer loop (healthy ~0.25-0.35s here)
  - fault: first-touch of 256MB anonymous pages (healthy <1.5s;
           degraded episodes measured 7-50s)

Exit code 0 if healthy, 1 if degraded. Use before any bench sweep.
"""
import mmap, sys, time

t0 = time.perf_counter()
x = 0
for i in range(3_000_000):
    x += i ^ (i << 3)
cpu = time.perf_counter() - t0

m = mmap.mmap(-1, 256 << 20)
t0 = time.perf_counter()
for off in range(0, 256 << 20, 4096):
    m[off] = 1
fault = time.perf_counter() - t0
m.close()

us_page = fault / (256 << 20) * 4096 * 1e6
healthy = cpu < 0.7 and fault < 1.5
print(f"cpu_loop={cpu:.3f}s fault_256mb={fault:.2f}s ({us_page:.2f} us/page) "
      f"{'HEALTHY' if healthy else 'DEGRADED'}")
sys.exit(0 if healthy else 1)
