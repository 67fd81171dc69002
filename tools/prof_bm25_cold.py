"""Phase-level timing of a COLD q32 Bm25Search build at sf0.1: raw
postings build+store, scored store, termdf, seed table, query exec.
Deterministic job counts via the status tracker; wall per phase."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warp_pipes_spark.session import get_spark
from warp_pipes_spark.pipes.cache import clear_all_artifact_caches

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="wps-prof-bm25")
spark.sparkContext.setLogLevel("ERROR")
clear_all_artifact_caches()
spark.range(1).count()

from warp_pipes_spark.queries import QUERIES, T, _bm25_queries
from warp_pipes_spark.search.bm25 import Bm25Search

def jobs():
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))

def phase(label, fn):
    t0 = time.time(); n0 = jobs()
    out = fn()
    dt = time.time() - t0; n1 = jobs()
    print(f"{label:30s} {dt:7.2f}s  jobs+{n1-n0}")
    return out

docs = T(spark, sf_dir, "documents")
qs = _bm25_queries(spark, sf_dir)
eng = Bm25Search(corpus=docs, k=10)

raw = phase("raw postings (build+store)", lambda: eng._raw_postings())
idx = phase("scored index (score+store)", lambda: eng._index())
stats = phase("term stats artifact", lambda: eng._term_stats(idx))
npost = phase("n_postings probe", lambda: eng._n_postings(stats))
seed = phase("seed table artifact", lambda: eng._seed_table(idx))
out = eng(qs)
phase("query exec (noop)", lambda: out.write.format("noop").mode("overwrite").save())
t0=time.time()
out2 = Bm25Search(corpus=docs, k=10)(qs)
out2.write.format("noop").mode("overwrite").save()
print(f"{'warm end-to-end':30s} {time.time()-t0:7.2f}s")
