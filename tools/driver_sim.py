import os, sys, math, time, json
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as e
from pyspark.sql import SparkSession

SF = os.environ.get("SIM_SF", "/root/testdata/sf0.01")
conf = (SparkSession.builder.master(os.environ.get("SIM_MASTER","local[8]"))
        .config("spark.sql.shuffle.partitions", os.environ.get("SIM_SHUF","8"))
        .config("spark.sql.session.timeZone","UTC")
        .config("spark.ui.enabled","false")
        .config("spark.driver.memory","12g"))
if os.environ.get("SIM_SPLIT"):
    conf = conf.config("spark.sql.files.maxPartitionBytes", os.environ["SIM_SPLIT"])
spark = conf.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = os.path.join(SF, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    key=lambda v:(v is None,str(type(v)),str(v))
    return sorted([tuple(r[i] for i in order) for r in rows], key=lambda r: tuple(key(v) for v in r))
def eq(a,b):
    if a is None or b is None: return a is None and b is None
    if isinstance(a,float) or isinstance(b,float):
        fa,fb=float(a),float(b)
        if math.isnan(fa) or math.isnan(fb): return math.isnan(fa) and math.isnan(fb)
        return fa==fb
    return a==b

qs, osql = e.queries(), e.oracle_sql()
names = sys.argv[1:] or list(qs)
results = {}
t_total = time.time()
for name in names:
    t0 = time.time()
    status, detail = "PASS", ""
    try:
        sdf = qs[name](spark, SF)
        scols = sdf.columns; srows=[tuple(r) for r in sdf.collect()]
        if name in osql:
            res = con.execute(osql[name]); dcols=[d[0] for d in res.description]; drows=res.fetchall()
            if sorted(scols)!=sorted(dcols): status,detail="SCHEMA",f"{sorted(scols)} vs {sorted(dcols)}"
            elif len(srows)!=len(drows): status,detail="ROWS",f"{len(srows)} vs {len(drows)}"
            else:
                ns,nd = norm(srows,scols), norm(drows,dcols)
                for i,(rs,rd) in enumerate(zip(ns,nd)):
                    for j,(a,b) in enumerate(zip(rs,rd)):
                        if not eq(a,b):
                            status,detail="HASH",f"row{i} {sorted(scols)[j]}: {a!r} vs {b!r}"; break
                    if status!="PASS": break
        else:
            status = "ROWSONLY"
    except Exception as ex:
        status, detail = "ERROR", f"{type(ex).__name__}: {str(ex)[:150]}"
    dt = time.time()-t0
    results[name] = (status, round(dt,2), detail)
    print(f"{name}: {status} {dt:.1f}s {detail}", flush=True)
bad = [n for n,(s,_,_) in results.items() if s not in ("PASS","ROWSONLY")]
print(f"\nTOTAL {time.time()-t_total:.0f}s; {len(bad)} failures: {bad}")
json.dump({n:{"status":s,"sec":d} for n,(s,d,_) in results.items()}, open("/tmp/driver_sim_last.json","w"), indent=1)
sys.exit(1 if bad else 0)
