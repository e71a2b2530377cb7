"""r13: sf1 A/B of the under-split-scan spread in the pair engine —
SPARK_GRAFT_SPREAD_MIN_MB toggled per run in ONE session (read at call
time): 32 (fires on the 70 MB single-row-group sf1 file) vs 100000
(never fires = old behavior).  Order OFF ON ON OFF, min-of-2, memsum
before each, hash compared.
"""
import json, os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
from pyspark.sql import functions as F
from etl_marketeye_airflow_spark._registry_base import _ppjoin_pairs
from etl_marketeye_airflow_spark.operators.ranking import release_local_checkpoint
from etl_marketeye_airflow_spark.session import get_spark

def memsum():
    t0=time.time(); float(np.sum(np.ones(25_000_000))); return round(time.time()-t0,3)

def main():
    sf_dir = sys.argv[1] if len(sys.argv)>1 else "/root/repo/probes/sf1"
    spark = get_spark("spread-sf1-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # uncharged warmup
    os.environ["SPARK_GRAFT_SPREAD_MIN_MB"]="100000"
    w0=time.time(); out=_ppjoin_pairs(spark, sf_dir); out.count(); release_local_checkpoint(out)
    print("warmup(uncharged, off)", round(time.time()-w0,3), flush=True)
    res=[]
    for tag,mb in (("off","100000"),("on","32"),("on","32"),("off","100000")):
        os.environ["SPARK_GRAFT_SPREAD_MIN_MB"]=mb
        spark.catalog.clearCache()
        m=memsum(); t0=time.time()
        out=_ppjoin_pairs(spark, sf_dir); n=out.count()
        dt=round(time.time()-t0,3)
        h=out.select(F.sum(F.xxhash64(F.struct("id_a","id_b","jaccard")).cast("decimal(38,0)"))).collect()[0][0]
        release_local_checkpoint(out)
        res.append({"v":tag,"sec":dt,"memsum":m,"n":n,"hash":str(h)})
        print(res[-1], flush=True)
    mins={v:min(r["sec"] for r in res if r["v"]==v) for v in ("off","on")}
    summary={"sf_dir":sf_dir,"order":"off on on off","runs":res,"mins":mins,
             "hash_equal":len({r["hash"] for r in res})==1}
    print(json.dumps(summary), flush=True)
    with open(Path(__file__).parent/"r13_spread_sf1_ab.json","w") as f:
        json.dump(summary,f,indent=1)
    spark.stop()

if __name__=="__main__":
    main()
