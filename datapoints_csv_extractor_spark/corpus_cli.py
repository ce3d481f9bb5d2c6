"""CLI for the corpus-curation side of the engine: run the full
shard-ingest plan (PII scrub -> quality gate -> optional classifier /
resampling -> incremental dedup -> split -> publish) over a JSONL
shard, in batch or streaming (availableNow drain) mode.

Run:
    python -m datapoints_csv_extractor_spark.corpus_cli \
        --input shard.jsonl --corpus corpus/ --store bandstore/

Streaming over a growing folder of shards:
    python -m datapoints_csv_extractor_spark.corpus_cli \
        --input shards_dir/ --corpus corpus/ --store bandstore/ \
        --stream --checkpoint ckpt/

The batch mode prints the count ledger as one JSON line (received /
pii_redacted / low_quality / resampled_out / duplicate / published) —
the numbers an ingest pipeline alarms on.
"""

from __future__ import annotations

import argparse
import json
import sys

from datapoints_csv_extractor_spark.session import get_spark


def _parse_resample(specs: list[str]) -> dict[str, str]:
    """``source=hexbound`` pairs -> dict (e.g. crawl=40 keeps ~25%).

    Bounds are validated and lowercased: the keep decision is a
    lexicographic compare against a LOWERCASE md5 prefix, so an
    uppercase or short bound would silently shift the keep rate
    instead of erroring.
    """
    import re

    out: dict[str, str] = {}
    for spec in specs:
        if "=" not in spec:
            raise SystemExit(f"--resample expects source=hexbound, got {spec!r}")
        src, bound = spec.split("=", 1)
        bound = bound.lower()
        if not re.fullmatch(r"[0-9a-f]{2}|zz", bound):
            raise SystemExit(
                f"--resample bound must be two hex digits (00..ff) or 'zz' "
                f"(keep all), got {spec!r}"
            )
        out[src] = bound
    return out


def _parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        prog="datapoints_csv_extractor_spark.corpus_cli"
    )
    parser.add_argument("--input", "-i", required=True, help="JSONL shard file (batch) or folder of shards (--stream)")
    parser.add_argument("--corpus", "-o", required=True, help="Curated corpus path (split-partitioned parquet)")
    parser.add_argument("--store", "-s", required=True, help="Persisted MinHash band store path")
    parser.add_argument("--stream", action="store_true", help="Streaming mode over a folder (availableNow drain)")
    parser.add_argument("--checkpoint", default=None, help="Streaming checkpoint dir (default <corpus>_checkpoint)")
    parser.add_argument("--no-pii-redaction", action="store_true", help="Skip the PII scrub stage")
    parser.add_argument("--classifier-threshold", type=float, default=None, help="Also gate on the hashed linear classifier score")
    parser.add_argument(
        "--resample", action="append", default=[],
        metavar="SOURCE=HEXBOUND",
        help="Per-source md5-prefix keep bound (repeatable), e.g. crawl=40 keeps ~25%% of source 'crawl'",
    )
    parser.add_argument("--est-threshold", type=float, default=0.5, help="Estimated-Jaccard duplicate threshold")
    parser.add_argument(
        "--line-dedup", type=int, default=None, metavar="TOKENS_PER_LINE",
        help="C4-style within-shard line dedup: repeated N-token lines "
        "survive only at their first occurrence; documents are "
        "reassembled from kept lines (try 10)",
    )
    parser.add_argument(
        "--max-repeated-fraction", type=float, default=None, metavar="FRAC",
        help="Drop documents whose repeated-5-gram fraction exceeds FRAC "
        "(the suffix-array-style repetition filter), e.g. 0.5",
    )
    parser.add_argument(
        "--bm25-index", default=None, metavar="PATH",
        help="Also fold published documents into a standing BM25 "
        "inverted-index store at PATH (seeded on first use; per-shard "
        "idempotent appends)",
    )
    parser.add_argument(
        "--lm-store", default=None, metavar="PATH",
        help="Gate on bigram-LM perplexity against the persisted "
        "reference model at PATH (textops.build_lm_store)",
    )
    parser.add_argument(
        "--max-ppl", type=float, default=1000.0, metavar="PPL",
        help="Perplexity bound for --lm-store (default 1000)",
    )
    parser.add_argument(
        "--dsir-store", default=None, metavar="PATH",
        help="Gate on DSIR importance log-weight against the persisted "
        "target/raw model at PATH (curation.build_dsir_store)",
    )
    parser.add_argument(
        "--min-dsir-logweight", type=float, default=0.0, metavar="LW",
        help="Log-weight floor for --dsir-store (default 0.0)",
    )
    parser.add_argument("--master", default=None, help="Spark master override")
    return parser.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = _parse_args(argv)
    spark = get_spark(app_name="corpus-ingest", master=args.master)
    stage_kwargs = dict(
        est_threshold=args.est_threshold,
        redact_pii=not args.no_pii_redaction,
        classifier_threshold=args.classifier_threshold,
        resample_thresholds=_parse_resample(args.resample) or None,
        line_dedup_tokens=args.line_dedup,
        max_repeated_fraction=args.max_repeated_fraction,
        bm25_index_path=args.bm25_index,
        lm_store_path=args.lm_store,
        max_ppl=args.max_ppl,
        dsir_store_path=args.dsir_store,
        min_dsir_logweight=args.min_dsir_logweight,
    )

    from datapoints_csv_extractor_spark.plans.corpus_ingest import (
        ingest_corpus_shard,
        stream_ingest_corpus,
    )
    from datapoints_csv_extractor_spark.sources.documents import (
        DOCUMENT_SCHEMA,
        read_documents_jsonl,
    )

    if args.stream:
        checkpoint = args.checkpoint or f"{args.corpus}_checkpoint"
        ledgers: list[dict] = []
        # The file-stream source cannot run the batch reader's two-pass
        # skip-don't-fail parse; PERMISSIVE mode turns malformed lines
        # into all-null rows instead. Dropping null-keyed rows here
        # keeps the streaming ledger consistent with batch mode (a
        # corrupt line is never counted as 'received').
        docs_stream = (
            spark.readStream.schema(DOCUMENT_SCHEMA)
            .json(args.input)
            .where("doc_id IS NOT NULL AND text IS NOT NULL")
        )
        q = stream_ingest_corpus(
            spark,
            docs_stream,
            args.corpus,
            args.store,
            checkpoint,
            on_batch=lambda bid, stats: ledgers.append({"batch": bid, **stats}),
            **stage_kwargs,
        )
        q.awaitTermination()
        for ledger in ledgers:
            print(json.dumps(ledger))
        return 0

    stats = ingest_corpus_shard(
        spark,
        read_documents_jsonl(spark, args.input),
        args.corpus,
        args.store,
        **stage_kwargs,
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
