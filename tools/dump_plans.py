"""Dump .explain('formatted') for named queries to plans/<outdir>/<query>_<tag>.txt
(the round's judge-checkable plan artifacts).

Usage: python tools/dump_plans.py <outdir> <tag> q03 q157 ...
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from etl_wrap_spark import catalog
from etl_wrap_spark.session import get_session

def main():
    outdir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_session("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    for want in names:
        full = next((k for k in qs if k.startswith(want + "_") or k == want), None)
        if full is None:
            print("missing:", want); continue
        df = qs[full](spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{full}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        print("wrote", full, tag, len(txt))

if __name__ == "__main__":
    main()
