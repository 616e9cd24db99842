"""End-to-end LLM corpus curation: clean → quality-filter → dedup → write,
with per-stage attribution metrics (beyond-ref; the app-level composition of
the engine's text/dedup operators — what a training-data team actually runs
nightly over the raw crawl).

Stages (each optional except read/write):
  1. Clean: URL/email/control scrub, whitespace collapse
     (``operators.text.clean_text`` — one codegen'd projection).
  2. Quality funnel: ordered C4/Gopher-style cuts with FIRST-FAILING-RULE
     attribution (``operators.text.quality_funnel``); only ``pass`` docs
     continue, and the per-(source, verdict) counts go into the report.
  3. Exact dedup: md5 digest, keep the minimum doc_id per digest — digests
     shuffle, never text.
  4. Near dedup: MinHash+LSH candidate pairs → connected components →
     per-group keeper; only keepers survive.
  5. Write: parquet (default) or gzip JSONL, plus a metrics report parquet
     (one row per stage: docs in / docs out / docs dropped).

Scale notes: the funnel is a projection (free); exact dedup is one digest
hash-agg; near dedup is the Σ bucket² LSH join (never n²); each stage's
in/out counts are cheap aggregates over already-materialized stage outputs
(the curated corpus is checkpointed once before the final fan-out to
writes+counts, so nothing recomputes the pipeline per consumer).
``--plan_check`` runs the analysis-only plan-budget gate
(``plans.budget.assert_plan_budget``) on the composed pipeline before the
writes: bounded exchanges, no single-partition window, no Python row eval.
(The near-dedup stage materializes its input eagerly, so the gate covers
the plan from that barrier onward — the LSH join + keeper section, which
is where a scale regression would hide.)

Run:
  python -m cehrbert_data_spark.apps.curate_corpus \
    --input_dir /root/testdata/sf0.001/documents.parquet \
    --output_dir /tmp/curated [--format jsonl] [--no_near_dedup] [--plan_check]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, functions as F

from cehrbert_data_spark.operators.dedup import dedup_keepers, minhash_lsh_pairs
from cehrbert_data_spark.operators.text import clean_text, quality_funnel, words
from cehrbert_data_spark.session import build_session
from cehrbert_data_spark.sources.readers import read_parquet
from cehrbert_data_spark.sources.writers import (
    checkpoint_barrier,
    write_jsonl,
    write_parquet,
)

#: Default funnel (same thresholds as queries/llm.py:t_quality_funnel, kept
#: in one place so the report query and the app can't drift).
def default_rules(n_words, n_distinct, n_stop):
    return [
        ("too_short", n_words < 25),
        ("too_long", n_words > 90),
        ("low_diversity", n_distinct * 100 < n_words * 35),
        ("high_stopword", n_stop * 100 > n_words * 9),
    ]


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    clean: bool = True,
    funnel: bool = True,
    exact_dedup: bool = True,
    near_dedup: bool = True,
) -> tuple[DataFrame, list[tuple[str, DataFrame]]]:
    """Compose the pipeline lazily; returns (curated_df, stage outputs) where
    stage outputs are (name, DataFrame) pairs for metric counting. Nothing
    executes until the caller acts."""
    stages: list[tuple[str, DataFrame]] = [("input", docs)]
    cur = docs
    if clean:
        cur = cur.withColumn(text_col, clean_text(F.col(text_col)))
    if funnel:
        w = words(F.col(text_col))
        sw = F.array(
            *[F.lit(s) for s in ["the", "a", "of", "and", "to", "in", "is", "it"]]
        )
        n_words = F.size(w)
        n_distinct = F.size(F.array_distinct(w))
        n_stop = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
        labeled = quality_funnel(
            cur, default_rules(n_words, n_distinct, n_stop)
        )
        stages.append(("funnel_report", labeled.groupBy("verdict").count()))
        cur = labeled.where(F.col("verdict") == "pass").drop("verdict")
    if exact_dedup:
        keep = cur.groupBy(F.md5(F.col(text_col)).alias("__digest")).agg(
            F.min(id_col).alias(id_col)
        )
        cur = cur.join(keep.select(id_col), id_col, "left_semi")
        stages.append(("after_exact_dedup", cur))
    if near_dedup:
        # the survivors feed BOTH the LSH pass and the keeper join — barrier
        # once (id+text grain) so the upstream funnel/dedup don't recompute
        cur = checkpoint_barrier(cur)
        pairs = minhash_lsh_pairs(cur, id_col, text_col)
        keepers = dedup_keepers(cur, pairs, id_col=id_col)
        survivors = keepers.where(F.col("id") == F.col("keeper")).select(
            F.col("id").alias(id_col)
        )
        cur = cur.join(survivors, id_col, "left_semi")
        stages.append(("after_near_dedup", cur))
    return cur, stages


def main(
    input_dir: str,
    output_dir: str,
    out_format: str = "parquet",
    clean: bool = True,
    funnel: bool = True,
    exact_dedup: bool = True,
    near_dedup: bool = True,
    plan_check: bool = False,
    spark=None,
) -> dict:
    spark = spark or build_session("curate_corpus")
    docs = read_parquet(spark, input_dir)
    curated, stages = curate(
        docs,
        clean=clean,
        funnel=funnel,
        exact_dedup=exact_dedup,
        near_dedup=near_dedup,
    )
    if plan_check:
        from cehrbert_data_spark.plans.budget import assert_plan_budget

        assert_plan_budget(curated, "curate_corpus", max_exchanges=24)

    curated = checkpoint_barrier(curated)  # one materialization feeds writes+counts
    metrics: dict[str, int] = {}
    report_rows = []
    for name, df in stages:
        if name == "funnel_report":
            for r in df.collect():
                metrics[f"funnel_{r['verdict']}"] = r["count"]
                report_rows.append((f"funnel_{r['verdict']}", r["count"]))
        else:
            n = df.count()
            metrics[name] = n
            report_rows.append((name, n))
    n_out = curated.count()
    metrics["output"] = n_out
    report_rows.append(("output", n_out))

    if out_format == "jsonl":
        write_jsonl(curated, f"{output_dir}/corpus")
    else:
        write_parquet(curated, f"{output_dir}/corpus")
    report = spark.createDataFrame(report_rows, "stage: string, n_docs: long")
    write_parquet(report, f"{output_dir}/report")
    return metrics


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Curate an LLM text corpus")
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--format", default="parquet", choices=["parquet", "jsonl"])
    p.add_argument("--no_clean", action="store_true")
    p.add_argument("--no_funnel", action="store_true")
    p.add_argument("--no_exact_dedup", action="store_true")
    p.add_argument("--no_near_dedup", action="store_true")
    p.add_argument("--plan_check", action="store_true")
    return p.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    out = main(
        args.input_dir,
        args.output_dir,
        out_format=args.format,
        clean=not args.no_clean,
        funnel=not args.no_funnel,
        exact_dedup=not args.no_exact_dedup,
        near_dedup=not args.no_near_dedup,
        plan_check=args.plan_check,
    )
    print(out)
