"""A/B fan_out for plans/documents.py keys (same method as ab_fanout.py)."""
from __future__ import annotations
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from maap_data_pipelines_spark.session import get_spark
from maap_data_pipelines_spark.plans import documents as D
from maap_data_pipelines_spark.sources import catalog as C

orig = C.read_table
def main():
    args = sys.argv[1:]
    reps = int(args[0]) if args and args[0].isdigit() else 3
    keys = args[1:] if args and args[0].isdigit() else args
    spark = get_spark("ab-docs"); spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    def fanned(s, d, n):
        return C.fan_out(orig(s, d, n))
    D.read_table = orig
    D.QUERIES["token_stats"](spark, sf).write.format("noop").mode("overwrite").save()
    for key in keys:
        fn = D.QUERIES[key]; t_off, t_on = [], []
        for _ in range(reps):
            for mode, sink in ((orig, t_off), (fanned, t_on)):
                D.read_table = mode
                t0 = time.time()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                sink.append(time.time() - t0)
        t_off.sort(); t_on.sort()
        om, nm = t_off[len(t_off)//2], t_on[len(t_on)//2]
        v = "FAN" if nm < om*0.95 else ("OFF" if om < nm*0.95 else "~")
        print(f"{key}: off={om:.2f} on={nm:.2f} -> {v}  off={ [round(x,2) for x in t_off] } on={ [round(x,2) for x in t_on] }", flush=True)
    D.read_table = orig
if __name__ == "__main__":
    main()
