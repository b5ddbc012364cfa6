#!/usr/bin/env python
"""Dump .explain("formatted") for the named queries into plans/<tag>/.

    python scripts/dump_plans.py <tag> <suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt. With no query args, dumps the
round's default optimization-target list. Plans are built at
$SPARK_GRAFT_SF_DIR (default sf0.1) — note queries that train models
in their builder (kmeans/PQ) run those jobs during construction; the
file captures the FINAL query's physical plan.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

from chill_spark import queries as Q
from chill_spark.session import get_spark

DEFAULT = [
    "q_ann_pq_topk",
    "q_ann_ivfpq_topk",
    "q_ann_pq_stored",
    "q_ann_pq_join",
    "q_semantic_dedup",
    "q_semantic_dedup_largek",
    "q_kmeans_clusters",
    "q_embedding_centroids",
    "q_cluster_balanced_sample",
    "q_ann_topk",
    "q_ann_quantized_topk",
    "q_ann_recall",
    "q_ann_rerank",
    "q_corpus_prep_pipeline",
    "q_corpus_prep_v2",
    "q_corpus_prep_v3",
    "q_contamination_incremental",
    "q_classifier_calibration",
    "q_train_quality_classifier",
    "q_substring_dedup_incremental",
    "q_substring_dedup_spans",
    "q_dup_rate_by_source",
    "q_bloom_doc_verdicts",
    "q_decontam_bloom",
    "q_dedup_incremental",
    "q_embedding_near_dups_lsh",
    "q_dedup_simhash",
    "q_dedup_minhash",
    "q_embedding_incremental",
    "q_heavy_hitters",
    "q_hybrid_retrieval",
    "q_embedding_rp",
]


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()
    for name in names:
        try:
            df = registry[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}", flush=True)
        except Exception as e:  # keep going; report at the end
            print(f"FAILED {name}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
