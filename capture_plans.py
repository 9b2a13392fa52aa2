"""Capture .explain('formatted') for headline bench queries into
plans/$PLANS_ROUND/<name>_<tag>.txt (tag = before/after via argv[1];
PLANS_ROUND defaults to r20)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE
from rusty_timeseries_db_spark import queries as _q
from rusty_timeseries_db_spark.plans.explain import formatted_plan
from rusty_timeseries_db_spark.session import get_spark

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2:])
names = list(HEADLINE) + [n for n in only if n not in HEADLINE]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "plans",
    os.environ.get("PLANS_ROUND", "r20"),
)
os.makedirs(out_dir, exist_ok=True)
spark = get_spark(app_name="rtsdb-plan-capture", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")
fns = _q.all_queries()
for name in names:
    if only and name not in only:
        continue
    try:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        plan = formatted_plan(fns[name](spark, sf_dir))
    except Exception as e:  # fixture-dependent plans must never kill the sweep
        plan = f"ERROR {type(e).__name__}: {e}\n"
    with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
        f.write(plan)
    print(f"captured {name}", file=sys.stderr)
print("done")
