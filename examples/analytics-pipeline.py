"""Round-4 analytics layer end-to-end: perplexity-gated curation with
keep-best dedup, event funnels + cohort retention, Misra-Gries heavy
hitters, and the plan scale-auditor as a CI gate."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root import shim (unneeded once pip-installed)


from ballista import BallistaContext
from pyspark.sql import functions as F

from datafusion_ballista_python_spark.operators import dedup, text
from datafusion_ballista_python_spark.operators import events as ev
from datafusion_ballista_python_spark.operators.sketch import frequent_items
from datafusion_ballista_python_spark.plans import audit

ctx = BallistaContext(master="local[8]", shuffle_partitions=8)
spark = ctx.spark
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

# 1. corpus-LM perplexity gate -> near-dup pairs -> keep the longest copy
ppl = text.unigram_perplexity(docs)
gated = docs.join(ppl.where(F.col("bits_per_token") <= 5.0).select("doc_id"), "doc_id")
pairs = dedup.minhash_lsh_pairs(gated, threshold=0.8)
survivors = dedup.survivor_selection(gated, pairs, score_col="n_chars")
print("curated corpus:", survivors.where("keep").count(), "of", docs.count())

# 2. cross-document repeated spans (memorization risk report)
spans = text.repeated_spans(docs, n=8, min_docs=2)
print("repeated 8-gram spans:", spans.count())

# 3. conversion funnel + daily retention over the event stream
funnel = ev.funnel(events, steps=("view", "click", "purchase"), within="7 days")
funnel.groupBy("steps_completed").count().orderBy("steps_completed").show()
ev.cohort_retention(events, period="day").orderBy(
    "cohort_start", "periods_since"
).show(5)

# 4. bounded-memory heavy hitters (exact here: capacity >> distinct)
frequent_items(events, "event_type", capacity=64).show()

# 5. incremental maintenance: MERGE a re-scored batch into a partitioned
#    copy of the corpus — only the touched partitions rewrite
import tempfile

from datafusion_ballista_python_spark.sources.merge import merge_into_path

store = tempfile.mkdtemp() + "/corpus"
docs.write.partitionBy("lang").parquet(store)
rescored = docs.where("lang = 'en'").orderBy("doc_id").limit(5).withColumn(
    "text", F.concat(F.lit("RESCORED "), F.col("text"))
)
touched = merge_into_path(spark, store, rescored, key="doc_id", partition_col="lang")
print("merge touched partitions:", touched)

# 6. the scale checklist as a gate: no error-severity plan findings
for name, df in [("funnel", funnel), ("survivors", survivors)]:
    errors = [f for f in audit(df) if f["severity"] == "error"]
    assert not errors, (name, errors)
print("plan audit: clean")
