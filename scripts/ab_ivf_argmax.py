"""Interleaved same-session A/B: packed-long vs struct argmax in
_ivf_assign (r8).  Host-load drift cancels because both forms run
alternately in one session.  Not part of any driver contract.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from pyspark.sql import functions as F
    from engine.session import get_spark
    from engine.queries import _REGISTRY
    import engine.analytics as A

    new_assign = A._ivf_assign

    def struct_assign(emb, cent):
        pick = F.max(F.struct(F.round(F.expr(A._COS_E_CE), 6).alias("c"),
                              (-F.col("cell")).alias("nc")))
        return (emb.crossJoin(F.broadcast(cent))
                .groupBy("vec_id").agg(pick.alias("m"))
                .select("vec_id", (-F.col("m.nc")).alias("cell")))

    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    qnames = sys.argv[1:] or ["ann_ivf_topk", "semdedup"]
    forms = {"struct": struct_assign, "packed": new_assign}
    res = {f: {q: [] for q in qnames} for f in forms}
    for form, fn_assign in forms.items():   # warmup both
        A._ivf_assign = fn_assign
        for q in qnames:
            fn, _ = _REGISTRY[q]
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
    for rep in range(4):
        for form, fn_assign in forms.items():
            A._ivf_assign = fn_assign
            for q in qnames:
                spark.catalog.clearCache()
                fn, _ = _REGISTRY[q]
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                res[form][q].append(round(time.time() - t0, 3))
    A._ivf_assign = new_assign
    for form, d in res.items():
        for q, xs in d.items():
            print(f"{form:8s} {q:25s} min {min(xs):6.3f}  {xs}")
    spark.stop()


if __name__ == "__main__":
    main()
