"""Round-8 per-row probe: times any subset of bench.py's rows in
isolation (same corpora, same lambdas, same best-of-2-after-warm
protocol), canary-bracketed so a steal burst is attributable.

Usage: python jobs/r8_probe.py [row ...]        # default: all rows
       ZX_PROBE_RUNS=3 python jobs/r8_probe.py dedup_simhash

Prints one line per row: name, runs, best, median.  This is the r8
optimization round's A/B instrument — bench.py itself is FROZEN for
driver measurement and stays untouched.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EXTRACT_DOCS = int(os.environ.get("ZX_BENCH_DOCS", "20000"))
N_ADV = int(os.environ.get("ZX_BENCH_ADV_DOCS", "20000"))
CORPUS_CACHE = f"/tmp/zx-bench-corpus-{N_EXTRACT_DOCS}-42"
ADV_CACHE = f"/tmp/zx-bench-adv-{N_ADV}-42-v3"
RUNS = int(os.environ.get("ZX_PROBE_RUNS", "3"))


def main() -> None:
    import pyspark.sql.functions as F

    from zhtml_spark.corpus import adversarial_web_corpus, corpus_dataframe
    from zhtml_spark.pipeline import build_session, extract_documents
    from zhtml_spark.udfs import EXTRACT_SCHEMA, make_extract_udf

    spark = build_session(app="zx-r8-probe", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(CORPUS_CACHE):
        corpus_dataframe(spark, N_EXTRACT_DOCS, seed=42).write.mode(
            "overwrite"
        ).parquet(CORPUS_CACHE)
    docs = spark.read.parquet(CORPUS_CACHE)
    if not os.path.exists(ADV_CACHE):
        adversarial_web_corpus(spark, N_ADV, seed=42).write.mode(
            "overwrite"
        ).parquet(ADV_CACHE)
    adv = spark.read.parquet(ADV_CACHE)
    docs_tbl = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    from zhtml_spark.textops import (
        bigram_lm_selfscore,
        bm25_topk,
        cosine_topk,
        dedup_components,
        ivf_topk,
        lang_gate,
        line_dedup,
        minhash_banded_candidates,
        minhash_dup_candidates,
        ngram_jaccard_pairs,
        pack_sequences,
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

    _entry_queries = _entry.queries()

    def _extract():
        extract_documents(docs, num_partitions=2 * CPUS).agg(
            F.sum("n_spans")
        ).collect()

    def _structured():
        from zhtml_spark.extract import ExtractConfig

        cfg = ExtractConfig(
            emit_head_meta=True,
            emit_jsonld=True,
            emit_microdata=True,
            emit_rdfa=True,
        )
        extract_documents(docs, config=cfg, num_partitions=2 * CPUS).agg(
            F.sum("n_spans")
        ).collect()

    rows = {
        "extract_pipeline": _extract,
        "extract_structured": _structured,
        "warc_interleaved_pdf": lambda: _entry_queries["warc_pdf_extract"](
            spark, SF_DIR
        ).count(),
        "warc_charset_sniff": lambda: _entry_queries[
            "warc_charset_extract"
        ](spark, SF_DIR).count(),
        "dedup_minhash": lambda: minhash_dup_candidates(
            docs_tbl, n=3, seeds=8, min_agree=2
        ).count(),
        "dedup_minhash_banded": lambda: minhash_banded_candidates(
            docs_tbl, n=3, bands=4, rows=2
        ).count(),
        "dedup_simhash": lambda: simhash_dup_candidates(
            docs_tbl, max_hamming=6
        ).count(),
        "dedup_ngram_jaccard": lambda: ngram_jaccard_pairs(
            docs_tbl, n=3, threshold=0.05
        ).count(),
        "dedup_substring": lambda: substring_dup_spans(
            docs_tbl, k=25, min_len=60
        ).count(),
        "dedup_winnow": lambda: winnow_dup_candidates(
            docs_tbl, min_shared=5, max_doc_freq=20
        ).count(),
        "dedup_components": lambda: dedup_components(
            minhash_banded_candidates(docs_tbl, n=3, bands=4, rows=2)
        ).count(),
        "dedup_apply": lambda: substring_dedup_apply(
            docs_tbl, substring_dup_spans(docs_tbl, k=25, min_len=60)
        ).agg(F.sum("n_cut_chars")).collect(),
        "pack_sequences": lambda: pack_sequences(
            docs_tbl, budget_tokens=2048
        ).agg(F.count_distinct("bucket", "pack_id")).collect(),
        "dedup_lines": lambda: line_dedup(
            docs_tbl.withColumn(
                "text",
                F.concat_ws(
                    "\n",
                    F.lit("cookie banner line"),
                    F.col("text"),
                    F.concat(
                        F.lit("footer"),
                        (F.col("doc_id") % 7).cast("string"),
                    ),
                ),
            )
        ).agg(F.sum(F.length("text"))).collect(),
        "adv_minhash_banded": lambda: minhash_banded_candidates(
            adv, n=3, bands=4, rows=2
        ).count(),
        "adv_winnow": lambda: winnow_dup_candidates(
            adv, min_shared=5, max_doc_freq=20
        ).count(),
        "adv_substring": lambda: substring_dup_spans(
            adv, k=25, min_len=60
        ).count(),
        "adv_components": lambda: dedup_components(
            minhash_banded_candidates(adv, n=3, bands=4, rows=2)
        ).count(),
        "adv_lines": lambda: line_dedup(adv)
        .agg(F.sum(F.length("text")))
        .collect(),
        "lang_gate": lambda: lang_gate(
            docs_tbl, langs=("en", "es", "de"), min_lm_score=-8_400_000
        ).count(),
        "adv_lang_gate": lambda: lang_gate(
            adv, langs=("en", "es", "de"), min_lm_score=-8_400_000
        ).count(),
        "bm25_topk": lambda: bm25_topk(docs_tbl, bm25_queries, k=10).count(),
        "adv_selfscore": lambda: bigram_lm_selfscore(
            adv, n_buckets=1024
        ).count(),
        "cosine_topk": lambda: cosine_topk(
            emb, n_queries=100, k=10
        ).count(),
        "ivf_topk": lambda: ivf_topk(
            emb, n_queries=100, k=10, n_centroids=16, n_probe=4
        ).count(),
    }

    wanted = sys.argv[1:] or list(rows)
    unknown = [w for w in wanted if w not in rows]
    if unknown:
        raise SystemExit(f"unknown rows: {unknown}; have {list(rows)}")

    def canary() -> float:
        t0 = time.time()
        spark.range(400_000_000).groupBy(
            (F.col("id") % 9973).alias("k")
        ).agg(F.sum("id")).count()
        return round(time.time() - t0, 3)

    # fork python workers once (extraction rows need them warm)
    docs.limit(200).mapInPandas(make_extract_udf(), EXTRACT_SCHEMA).count()

    out: dict[str, dict] = {"canary_pre": canary()}
    for name in wanted:
        fn = rows[name]
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 3))
        srt = sorted(samples)
        out[name] = {
            "runs": samples,
            "best": srt[0],
            "median": srt[len(srt) // 2],
        }
        print(f"[probe] {name}: {samples} best={srt[0]}", file=sys.stderr)
    out["canary_post"] = canary()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
