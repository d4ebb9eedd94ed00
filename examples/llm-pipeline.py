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

# 4. hybrid retrieval: BM25 + cosine pools fused with RRF, and the rank
#    agreement between the two systems
from datafusion_ballista_python_spark.operators import retrieval

qterms = (
    text._terms(docs.filter(F.col("doc_id") == 0), "text", "doc_id")
    .select("term").distinct()
)
cands = docs.filter(F.col("doc_id") >= 5).join(
    emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
)
lex = retrieval.topk_ranking(
    retrieval.bm25_query_scores(cands, qterms), "bm25", "doc_id", n=20
)
qv = emb.filter(F.col("vec_id") == 0).select(
    F.lit(0).alias("qid"), F.col("embedding").alias("qe")
)
sem = retrieval.topk_ranking(
    similarity.cosine_topk(
        emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding"), qv, k=20
    ).select(F.col("vec_id").alias("doc_id"), "cos_sim"),
    "cos_sim", "doc_id", n=20,
)
retrieval.rrf_fuse({"lex": lex, "sem": sem}).orderBy(
    F.desc("rrf_score"), "doc_id"
).show(5)
retrieval.spearman_rho(lex, sem).show()
