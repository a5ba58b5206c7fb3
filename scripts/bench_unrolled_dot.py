"""HOF-fold vs unrolled decimal dot at 16M synthetic rows — the r14
"known next lever" experiment (r14 verdict #4): per-row CPU, wall, and
bit-identity of the two shapes.

Result on Spark 4.1.2, local[32] (committed in OPTIMIZATION_r15.md):
the unrolled 34-deep CAST(acc + CAST(x_j*w_j)) chain is ~2x SLOWER per
row than the interpreted aggregate/zip_with fold (88 vs 43 us/row task
CPU at 16M rows), values bit-identical. The deep nested-decimal tree
either overflows codegen method limits or generates worse code than
the HOF interpreter loop - the unroll hypothesis is REFUTED at scale,
not just at bench scale; the HOF shape stays everywhere.

Usage: SPARK_GRAFT_CPUS=32 python -u scripts/bench_unrolled_dot.py
"""
import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]").appName("unroll")
         .config("spark.sql.shuffle.partitions","32")
         .config("spark.sql.adaptive.enabled","true")
         .config("spark.driver.memory","16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from metrique_spark.plans.metrics import StageMetricsProbe
from metrique_spark.functions.classifier import _dlit, _DEC
probe = StageMetricsProbe(spark)

N = 16_000_000
DIMS = 34
W = [round(0.01*(j+1) - 0.17, 6) for j in range(DIMS)]

# deterministic synthetic features: x_j = round(pmod(id*(j+1), 97)/97, 6)
xs = F.array(*[F.round((F.pmod(F.col("id")*(j+1), F.lit(97)))/F.lit(97.0), 6)
               for j in range(DIMS)])
base = spark.range(0, N, 1, 64).select("id", xs.alias("x"))

w_lit = F.expr(_dlit(W))
dot_hof = F.aggregate(
    F.zip_with(F.col("x"), w_lit, lambda a, b: (a * b).cast(_DEC)),
    F.lit(0).cast(_DEC), lambda acc, t: (acc + t).cast(_DEC))

def dot_unrolled_sql():
    acc = f"CAST(0 AS {_DEC})"
    for j, v in enumerate(W):
        term = f"CAST((element_at(x, {j+1}) * {float(v)!r}D) AS {_DEC})"
        acc = f"CAST(({acc} + {term}) AS {_DEC})"
    return F.expr(acc)

def timed(label, col):
    best=None; bestcpu=None
    for _ in range(3):
        probe.start(); t0=time.time()
        base.select(col.alias("z")).write.format("noop").mode("overwrite").save()
        dt=time.time()-t0; sm=probe.finish()
        best = dt if best is None else min(best,dt)
        bestcpu = sm['task_cpu_s'] if bestcpu is None else min(bestcpu, sm['task_cpu_s'])
    print(f"{label}: wall={best:.2f}s task_cpu={bestcpu:.2f}s per_row_cpu={bestcpu/N*1e9:.0f}ns", flush=True)
    return best, bestcpu

timed("warmup-scan", F.size("x").cast("double"))
h = timed("HOF fold", dot_hof)
u = timed("unrolled expr", dot_unrolled_sql())
# bit identity
diff = base.select((dot_hof != dot_unrolled_sql()).cast("int").alias("d")).agg(F.sum("d")).collect()[0][0]
print("mismatch rows:", diff, flush=True)
print(json.dumps({"rows": N, "dims": DIMS, "hof_wall_s": round(h[0],2), "hof_task_cpu_s": round(h[1],2),
                  "unrolled_wall_s": round(u[0],2), "unrolled_task_cpu_s": round(u[1],2),
                  "bit_identical": diff == 0}))
