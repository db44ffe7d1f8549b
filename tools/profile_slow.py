"""Profile the slow bench queries' building blocks at sf0.1."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, df):
    t0 = time.perf_counter()
    n = df.count()
    print(f"{label:40s} {time.perf_counter() - t0:7.2f}s  rows={n}", flush=True)


def main():
    spark = get_session("profile-slow")
    from pyspark.sql import functions as F

    from blinkit_etl_pipeline_spark.operators import dedup, vector
    from blinkit_etl_pipeline_spark.plans import northstar as ns

    docs = ns._docs(spark, SF)
    emb = ns._emb(spark, SF)
    # warmup
    docs.count(); emb.count()

    t("docs token stats", docs.select(F.size(F.split("text", " ")).alias("n")).agg(
        F.avg("n"), F.max("n"), F.count("*")))

    t("exact cosine all-pairs (truth_e)",
      vector.cosine_neardup_pairs(emb, threshold=ns.COSINE_THRESHOLD, nbits=0))
    t("bucketed cosine pairs (found_e)",
      vector.cosine_neardup_pairs(emb, threshold=ns.COSINE_THRESHOLD, nbits=ns.ANN_NBITS))
    t("ngram jaccard (truth_j)",
      dedup.ngram_jaccard_pairs(docs, n=ns.NGRAM_N, threshold=ns.JACCARD_THRESHOLD))
    t("minhash lsh (found_m)",
      dedup.minhash_lsh_pairs(docs, n=ns.NGRAM_N, threshold=ns.JACCARD_THRESHOLD))

    t("dedup_groups full", ns.q_dedup_groups(spark, SF))
    t("text_repetition", ns.q_text_repetition(spark, SF))
    t("text_fingerprint", ns.q_text_fingerprint(spark, SF))
    t("ivf_topk (untrained)", ns.q_ann_ivf_topk(spark, SF))
    t("ivf_topk (trained)", ns.q_ann_ivf_trained(spark, SF))
    t("lsh_topk", ns.q_ann_lsh_topk(spark, SF))
    t("brute_force_topk", ns.q_ann_cosine_topk(spark, SF))


if __name__ == "__main__":
    main()
