"""Dump ``.explain("formatted")`` for the r8-touched query paths into
plans/r08/<name>_<tag>.txt (tag = before/after).

Usage: python jobs/r8_plans.py before [name ...]
       python jobs/r8_plans.py after  [name ...]

Covers the bench rows' dataframes (the driver-timed plans) plus the
touched registry queries at sf0.1.  Plan-only — nothing executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r08",
)


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), "tag must be before|after"

    import pyspark.sql.functions as F

    from zhtml_spark.pipeline import build_session

    spark = build_session(app="zx-r8-plans", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    docs_tbl = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    from zhtml_spark.textops import (
        bigram_lm_selfscore,
        bm25_topk,
        cosine_topk,
        ivf_topk,
        lang_gate,
        minhash_banded_candidates,
        minhash_dup_candidates,
        ngram_jaccard_pairs,
        simhash_dup_candidates,
        substring_dedup_apply,
        substring_dup_spans,
        winnow_dup_candidates,
    )

    bm25_queries = spark.createDataFrame(
        [
            (1, ["dup", "key"]),
            (2, ["customer", "join", "slow"]),
            (3, ["vector", "scan", "the"]),
        ],
        "query_id long, terms array<string>",
    )

    import __spark_entry__ as _entry

    q = _entry.queries()

    dfs = {
        "dedup_minhash": lambda: minhash_dup_candidates(
            docs_tbl, n=3, seeds=8, min_agree=2
        ),
        "dedup_minhash_banded": lambda: minhash_banded_candidates(
            docs_tbl, n=3, bands=4, rows=2
        ),
        "dedup_simhash": lambda: simhash_dup_candidates(
            docs_tbl, max_hamming=6
        ),
        "dedup_ngram_jaccard": lambda: ngram_jaccard_pairs(
            docs_tbl, n=3, threshold=0.05
        ),
        "dedup_substring": lambda: substring_dup_spans(
            docs_tbl, k=25, min_len=60
        ),
        "dedup_winnow": lambda: winnow_dup_candidates(
            docs_tbl, min_shared=5, max_doc_freq=20
        ),
        "dedup_apply": lambda: substring_dedup_apply(
            docs_tbl, substring_dup_spans(docs_tbl, k=25, min_len=60)
        ),
        "lang_gate": lambda: lang_gate(
            docs_tbl, langs=("en", "es", "de"), min_lm_score=-8_400_000
        ),
        "bm25_topk": lambda: bm25_topk(docs_tbl, bm25_queries, k=10),
        "adv_selfscore": lambda: bigram_lm_selfscore(
            docs_tbl, n_buckets=1024
        ),
        "cosine_topk": lambda: cosine_topk(emb, n_queries=100, k=10),
        "ivf_topk": lambda: ivf_topk(
            emb, n_queries=100, k=10, n_centroids=16, n_probe=4
        ),
        "warc_pdf_extract": lambda: q["warc_pdf_extract"](spark, SF_DIR),
        "extract_pipeline": lambda: q["interleaved_passthrough"](
            spark, SF_DIR
        )
        if "interleaved_passthrough" in q
        else None,
    }

    wanted = sys.argv[2:] or [k for k in dfs if k != "extract_pipeline"]
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in wanted:
        df = dfs[name]()
        if df is None:
            continue
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
