#!/usr/bin/env python
"""Round-12 sub-stage attribution for l2 / l2c / l4c (noop sink)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from projectmapreduce_spark.io import scan  # noqa: E402
from projectmapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn):
    for run in range(2):
        t0 = time.perf_counter()
        fn()
        print(f"{label} run{run}: {time.perf_counter()-t0:.3f}s", flush=True)


def main() -> None:
    spark = get_spark(app_name="attr-sub-r12", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    from projectmapreduce_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        simhash,
        simhash_candidates,
        tokens_of,
    )

    d = scan(spark, SF, "documents")
    d.count()  # warm footers

    # --- l2 pieces ---
    t("l2.tokens3(nondistinct)", lambda: noop(tokens_of(d, "doc_id", "text", 3, distinct=False)))
    t("l2.signatures", lambda: noop(minhash_signatures(tokens_of(d, "doc_id", "text", 3, distinct=False))))
    t("l2.candidates", lambda: noop(minhash_lsh_candidates(d, "doc_id", "text", shingle_n=3)))
    t("l2.tokens3(distinct)", lambda: noop(tokens_of(d, "doc_id", "text", 3, distinct=True)))

    # --- l2c pieces ---
    t("l2c.sig", lambda: noop(simhash(d, "doc_id", "text")))
    t("l2c.full", lambda: noop(simhash_candidates(simhash(d, "doc_id", "text"), 3)))

    # --- l4c pieces ---
    from projectmapreduce_spark.operators.similarity import (
        _fit_sample,
        _lloyd,
        ivf_ann_topk,
    )

    e = scan(spark, SF, "embeddings")
    e.count()

    def fit_only():
        vecs = _fit_sample(e, "vec_id", "embedding", 4096)
        _lloyd(vecs, 32, 2)

    t("l4c.fit(sample+lloyd)", fit_only)

    q = e.filter(F.col("vec_id") < 8)
    t(
        "l4c.full",
        lambda: noop(
            ivf_ann_topk(e, q, "vec_id", "embedding", "vec_id", "embedding", k=5,
                         k_clusters=32, n_probe=16, iters=2)
        ),
    )


if __name__ == "__main__":
    main()
