"""Isolated per-query timer matching bench.py methodology: warm at
sf0.001, warm input tables, then N timed noop-sink runs at the target
sf; prints per-rep seconds and the min. Usage:
    python time_query.py <query> [reps] [--executed-plan]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rusty_timeseries_db_spark import queries as _q
from rusty_timeseries_db_spark.session import get_spark

name = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 3
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name=f"time:{name}", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
fns = _q.all_queries()
fn = fns[name]

try:
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
except Exception as e:
    print(f"warm sf0.001 failed: {e}", file=sys.stderr)
from rusty_timeseries_db_spark.sources.registry import TABLES
for t in TABLES:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()

times = []
for i in range(reps):
    # a persisted subtree registered by rep N-1 would otherwise be
    # reused by rep N's identical analyzed plan (CacheManager matches
    # canonicalized plans) — that would measure a warm cache, not the
    # query; the bench/driver run each query once, so cold is honest
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    times.append(time.perf_counter() - t0)
    print(f"rep{i}: {times[-1]:.3f}s")
print(f"MIN {min(times):.3f}s  {name}")

if "--executed-plan" in sys.argv:
    df = fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = f"/tmp/executed_{name}.txt"
    with open(out, "w") as f:
        f.write(plan)
    print(f"executed plan -> {out}; ReusedExchange x{plan.count('ReusedExchange')}, "
          f"Scan parquet x{plan.count('Scan parquet')}")
