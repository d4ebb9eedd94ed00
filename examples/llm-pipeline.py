"""Beyond reference parity: the LLM-data-pipeline layer end-to-end —
quality-filter, exact+near dedup, cluster roll-up, and an ANN probe over
the synthetic corpus tables."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root import shim (unneeded once pip-installed)


from ballista import BallistaContext
from pyspark.sql import functions as F

from datafusion_ballista_python_spark.operators import dedup, graph, similarity, text

ctx = BallistaContext(master="local[8]", shuffle_partitions=8)
spark = ctx.spark
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

# 1. near-dup pairs -> duplicate clusters
pairs = dedup.minhash_lsh_pairs(docs, threshold=0.8)
clusters = graph.duplicate_clusters(pairs)
print("duplicate clusters:", clusters.count())

# 2. quality + tf-idf keywords for the survivors
keep = text.quality_scores(docs).where(F.col("alpha_ratio") > 0.5).select("doc_id")
top_terms = text.tfidf_top_terms(docs.join(keep, "doc_id", "left_semi"), k=3)
top_terms.show(5)

# 3. int8-quantized cosine search
q = emb.filter(F.col("vec_id") < 3).select(
    F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
)
similarity.quantized_cosine_topk(emb.filter(F.col("vec_id") >= 3), q, k=5).show(5)
