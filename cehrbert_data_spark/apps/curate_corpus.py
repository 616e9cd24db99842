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
hash-agg; near dedup is the Σ bucket² LSH join (never n²). Stage metric
counts never re-execute upstream lineage: the labeled funnel output and the
near-dedup input are each checkpointed ONCE and feed both their stage count
and the next stage, the final stage's count IS the curated barrier's count
(same content, counted once), and the curated corpus is checkpointed before
the final fan-out to writes+counts.
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

from cehrbert_data_spark.operators.dedup import (
    dedup_keepers,
    minhash_lsh_pairs,
    remove_duplicated_ngrams,
)
from cehrbert_data_spark.operators.text import (
    clean_text,
    default_funnel_rules,
    quality_funnel,
    words,
)
from cehrbert_data_spark.session import build_session
from cehrbert_data_spark.sources.readers import read_parquet
from cehrbert_data_spark.sources.writers import (
    checkpoint_barrier,
    write_jsonl,
    write_parquet,
)

def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    clean: bool = True,
    funnel: bool = True,
    exact_dedup: bool = True,
    near_dedup: bool = True,
    lsh_max_bucket: int | None = None,
    substring_dedup_n: int | None = None,
) -> tuple[DataFrame, list[tuple[str, DataFrame]], str | None]:
    """Compose the pipeline; returns (curated_df, stages, final_stage).

    ``stages`` are (name, DataFrame) pairs for metric counting, arranged so
    a count never re-executes upstream lineage: each counted DataFrame is a
    materialization barrier (or a cheap aggregate/filter over one) that the
    NEXT stage also consumes. ``final_stage`` names the stage whose content
    equals the returned curated DataFrame — the caller counts its own
    barrier once and reuses the number for that stage instead of counting
    the same rows twice. Nothing executes until the caller acts."""
    stages: list[tuple[str, DataFrame]] = [("input", docs)]
    cur = docs
    final_stage: str | None = None
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
            cur, default_funnel_rules(n_words, n_distinct, n_stop)
        )
        # ONE materialization feeds BOTH the verdict report and the
        # surviving rows (and, through them, every later stage): the report
        # is an aggregate over this barrier, not a re-run of read→clean→
        # funnel per consumer.
        labeled = checkpoint_barrier(labeled)
        stages.append(("funnel_report", labeled.groupBy("verdict").count()))
        cur = labeled.where(F.col("verdict") == "pass").drop("verdict")
    if substring_dedup_n is not None:
        # Substring-level exact dedup (Lee et al. EXACTSUBSTR): strip tokens
        # covered by corpus-duplicated n-grams BEFORE document-level dedup —
        # boilerplate inside otherwise-unique docs never reaches the LSH
        # pass. Barriered: the rewrite feeds the stage count AND the next
        # stage, and its own gram-digest agg must not recompute the funnel.
        cur = checkpoint_barrier(
            remove_duplicated_ngrams(
                cur, id_col, text_col, n=substring_dedup_n
            ).drop("n_tokens", "n_kept")
        )
        stages.append(("after_substring_dedup", cur))
        final_stage = "after_substring_dedup"
    if exact_dedup:
        keep = cur.groupBy(F.md5(F.col(text_col)).alias("__digest")).agg(
            F.min(id_col).alias(id_col)
        )
        cur = cur.join(keep.select(id_col), id_col, "left_semi")
        if near_dedup:
            # the exact-dedup survivors feed the stage count, the LSH pass
            # AND the keeper join — barrier once (id+text grain)
            cur = checkpoint_barrier(cur)
        stages.append(("after_exact_dedup", cur))
        final_stage = "after_exact_dedup"
    if near_dedup:
        if not exact_dedup:
            cur = checkpoint_barrier(cur)  # LSH + keeper join both read it
        # lsh_max_bucket: explicit production skew cap (see
        # operators.dedup.minhash_lsh_pairs) — surfaced as a flag, never
        # silently defaulted, so corpus shrinkage stays attributable
        pairs = minhash_lsh_pairs(
            cur, id_col, text_col, max_bucket_size=lsh_max_bucket
        )
        keepers = dedup_keepers(cur, pairs, id_col=id_col)
        survivors = keepers.where(F.col("id") == F.col("keeper")).select(
            F.col("id").alias(id_col)
        )
        cur = cur.join(survivors, id_col, "left_semi")
        stages.append(("after_near_dedup", cur))
        final_stage = "after_near_dedup"
    return cur, stages, final_stage


def main(
    input_dir: str,
    output_dir: str,
    out_format: str = "parquet",
    clean: bool = True,
    funnel: bool = True,
    exact_dedup: bool = True,
    near_dedup: bool = True,
    lsh_max_bucket: int | None = None,
    substring_dedup_n: int | None = None,
    shuffle_shards: int | None = None,
    plan_check: bool = False,
    spark=None,
) -> dict:
    spark = spark or build_session("curate_corpus")
    docs = read_parquet(spark, input_dir)
    curated, stages, final_stage = curate(
        docs,
        clean=clean,
        funnel=funnel,
        exact_dedup=exact_dedup,
        near_dedup=near_dedup,
        lsh_max_bucket=lsh_max_bucket,
        substring_dedup_n=substring_dedup_n,
    )
    if plan_check:
        from cehrbert_data_spark.plans.budget import assert_plan_budget

        assert_plan_budget(curated, "curate_corpus", max_exchanges=24)

    curated = checkpoint_barrier(curated)  # one materialization feeds writes+counts
    n_out = curated.count()
    metrics: dict[str, int] = {}
    report_rows = []
    for name, df in stages:
        if name == "funnel_report":
            for r in df.collect():
                metrics[f"funnel_{r['verdict']}"] = r["count"]
                report_rows.append((f"funnel_{r['verdict']}", r["count"]))
        elif name == final_stage:
            # identical content to the curated barrier counted above — reuse
            # the number instead of re-executing the stage's lineage
            metrics[name] = n_out
            report_rows.append((name, n_out))
        else:
            n = df.count()
            metrics[name] = n
            report_rows.append((name, n))
    metrics["output"] = n_out
    report_rows.append(("output", n_out))

    if out_format == "jsonl":
        write_jsonl(curated, f"{output_dir}/corpus")
    elif shuffle_shards:
        # training-ready layout: deterministic global shuffle into exactly
        # N shards (md5-keyed — reproducible membership AND in-shard order)
        from cehrbert_data_spark.sources.writers import write_shuffled_shards

        write_shuffled_shards(
            curated, f"{output_dir}/corpus", "doc_id", n_shards=shuffle_shards
        )
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
    p.add_argument(
        "--substring_dedup", type=int, default=None, metavar="N",
        help="strip tokens covered by corpus-duplicated N-grams before "
        "document-level dedup (Lee et al. EXACTSUBSTR; off by default)",
    )
    p.add_argument(
        "--shuffle_shards", type=int, default=None, metavar="N",
        help="write the curated corpus as N deterministically-shuffled "
        "parquet shards (md5-order; the training-ready layout)",
    )
    p.add_argument(
        "--lsh_max_bucket", type=int, default=None,
        help="exclude LSH buckets larger than this from pair generation "
        "(bounds the quadratic in-bucket cost; off by default)",
    )
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
        lsh_max_bucket=args.lsh_max_bucket,
        substring_dedup_n=args.substring_dedup,
        shuffle_shards=args.shuffle_shards,
        plan_check=args.plan_check,
    )
    print(out)
