"""Ad-hoc parity runner: python run_parity.py [name ...]"""
import sys
sys.path.insert(0, '/root/repo')
from rusty_timeseries_db_spark.session import get_spark
from rusty_timeseries_db_spark import queries as Q
from rusty_timeseries_db_spark.oracle import compare

spark = get_spark(master="local[8]")
sf = __import__("os").environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
only = set(sys.argv[1:])
results = []
for spec in Q._REGISTRY:
    if only and spec.name not in only:
        continue
    if spec.oracle is None:
        try:
            n = spec.fn(spark, sf).count()
            results.append(("ROWS", spec.name, f"{n} rows (no oracle)"))
        except Exception as e:
            results.append(("FAIL", spec.name, f"EXC {type(e).__name__}: {str(e)[:300]}"))
        continue
    try:
        ok, msg = compare(spec.fn(spark, sf), spec.oracle, sf)
    except Exception as e:
        ok, msg = False, f"EXC {type(e).__name__}: {str(e)[:300]}"
    results.append((("PASS" if ok else "FAIL"), spec.name, msg))
print()
for r in results:
    print("|", *r)
nfail = sum(1 for r in results if r[0]=="FAIL")
print(f"| TOTAL {len(results)} fail {nfail}")
